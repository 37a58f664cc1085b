"""Z-order (Morton) clustering: multi-dimension file skipping.

The manifest prunes files by per-column [min, max] stats
(manifest.pruned_files / collect_file_stats). How much those stats
prune depends entirely on the physical LAYOUT: a table sorted by
(service, ts) gives perfect service pruning but its per-file time
ranges are tight only WITHIN a service — a time-only predicate keeps
every service's files. Interleaving the bits of both columns' codes
into one sort key (the classic Z-order / Morton curve, what Delta's
OPTIMIZE ZORDER BY and Iceberg's zorder sort-order do) makes EVERY
clustered column's per-file range tight simultaneously, so single- and
multi-column range predicates all skip files — at 100 TB the
difference between planning a few files and planning a service's (or
an hour's) entire history.

Everything stays JVM-side codegen: codes are linear scalings /
bounded-vocabulary positions, the interleave is a fixed tree of
shift/or expressions — no UDF, no shuffle beyond the one range
repartition the rewrite needs anyway.

All clustering here is rewrite-time (the compactor is the natural
caller); readers need no new machinery — the existing stats pruning
simply starts biting on every clustered column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits per dimension: 65k distinct cells per column is far below
# per-file row counts (cells don't need to be unique, only ORDERED),
# and 2 dims x 16 bits = 32-bit keys, comfortably inside a long even
# at 3 dims.
DEFAULT_BITS = 16


def linear_code(col: Column, lo: float, hi: float, bits: int = DEFAULT_BITS) -> Column:
    """Scale a numeric column's [lo, hi] onto [0, 2^bits) — the rank
    proxy for continuous dimensions (timestamps as epoch micros).
    Values at hi clamp to the top cell; a degenerate span maps all to
    0 (constant column, nothing to order)."""
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(
        float(2**bits - 1)
    )
    return F.least(
        F.lit(2**bits - 1).cast("long"),
        F.greatest(F.lit(0).cast("long"), F.round(scaled).cast("long")),
    )


def vocab_code(col: Column, vocab: list[str], bits: int = DEFAULT_BITS) -> Column:
    """Ordinal code for a bounded-vocabulary string column: position in
    the SORTED vocabulary, spread across the code space so the string
    dimension occupies the same bit range as the numeric ones. Unseen
    values (vocabulary drift after the rewrite) code to 0 — ordering
    degrades gracefully, correctness never depends on the code."""
    vocab = sorted(vocab)
    pos = F.array_position(
        F.array(*[F.lit(v) for v in vocab]), col
    )  # 1-based, 0 when absent
    if len(vocab) <= 1:
        return F.lit(0).cast("long")
    step = (2**bits - 1) // max(len(vocab) - 1, 1)
    return (
        F.greatest(pos - 1, F.lit(0)).cast("long") * F.lit(int(step))
    ).cast("long")


def interleave(codes: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave: bit b of code i lands at position b*n + i.
    A fixed expression tree of shift/and/or terms — whole-stage codegen
    folds it into straight-line JVM code."""
    n = len(codes)
    assert 1 <= n * bits <= 63, "interleaved key must fit a long"
    longs = [c.cast("long") for c in codes]
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(longs):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * n + i))
    return out


def zorder_rewrite(
    df: DataFrame,
    codes: list[Column],
    n_files: int,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` z-contiguous write partitions:
    range-repartition on the interleaved key (one shuffle — sampled
    range bounds keep output files near-equal-sized even under skew),
    then sort within each so parquet row groups inherit the locality
    too. The key column is dropped before write; its effect lives in
    the file boundaries."""
    z = interleave(codes, bits).alias("__zkey__")
    out = df.select("*", z)
    out = out.repartitionByRange(max(n_files, 1), F.col("__zkey__"))
    out = out.sortWithinPartitions("__zkey__")
    return out.drop("__zkey__")
