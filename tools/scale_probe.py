"""Scale probe: measured evidence that the operator plans scale linearly.

Replicates the sf0.1 fact tables R times (default 16) into a scratch
directory and times a representative operator per shuffle shape at 1x
and Rx, reporting ``efficiency = t_Rx / (R * t_1x)`` — the fraction of
perfectly-linear cost the engine actually pays. efficiency <= ~1 means
the plan's cost grows at most linearly with the data (fixed per-job
overhead makes small-scale runs look worse per row, so values well
below 1 are expected on local[32]); anything clearly above 1 flags a
superlinear shape (an unbanded pair blowup, a broadcast that stopped
fitting, a collect that grew with the data) and fails the probe.

Replication preserves the semantics each operator family depends on:

- ``lineitem``/``orders`` copies offset ``*_orderkey`` so keys stay
  unique and the order->lineitem join fans out correctly; dimension
  tables (customer/supplier/part/nation/region) are NOT replicated —
  at real scale facts grow, dims don't (that is what makes them the
  broadcast side).
- ``documents`` copies rotate the letter alphabet so copies share
  almost no shingles — otherwise dedup would (correctly) find R-sized
  near-dup groups and the probe would measure R^2 pair-OUTPUT growth, a
  data artifact rather than the engine.
- ``embeddings`` copies perturb the first component so LSH/IVF buckets
  keep their load shape instead of stacking R identical vectors.
- ``events`` copies offset ``event_id`` and ``user_id``; timestamps are
  left alone, so per-(bucket, type) group sizes grow R-fold — the same
  thing that happens when a tenant's traffic grows.

Usage: ``python tools/scale_probe.py [--factor 16] [--out DIR]``.
Prints one JSON line per query plus a summary line; exits non-zero if
any efficiency exceeds the superlinearity threshold (1.3).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from signaldb_spark.catalog import load_table  # noqa: E402
from signaldb_spark.registry import all_queries  # noqa: E402
from signaldb_spark.session import get_spark  # noqa: E402

DEFAULT_SRC = "/root/testdata/sf0.1"
DIMS = ["customer", "supplier", "part", "nation", "region"]
KEY_SPAN = 10_000_000  # > max orderkey at sf0.1; keeps offset keys disjoint

# One representative per shuffle shape (see docs/architecture.md):
# scan+agg, multi-join, window family, parse+quantile, explode+band join,
# bucketed ANN join, trace shuffle + pointer chase, map-only text pass.
PROBE_QUERIES = [
    "pricing_summary",
    "region_revenue",
    "rate",
    "logql_json_quantile",
    "dedup_minhash_lsh",
    "emb_lsh_ann",
    "trace_descendant_spans",
    "text_quality",
    # round-5 shapes: time-RANGE window frame per key, and the
    # gaps-and-islands double window + chained joins
    "event_rolling_window",
    "session_funnel",
    # late-round-5 shapes: grouping-set Expand (2x pre-shuffle rows into
    # one partial+final agg), five-way broadcast-dim fact join, and the
    # explode-to-terms wordcount + per-lang window topk
    "rollup_revenue",
    "market_share",
    "zipf_slope",
    # blocked-similarity self-join (levenshtein inside prefix blocks;
    # alphabet rotation keeps per-copy blocks disjoint, so block size —
    # and the all-pairs bound — must stay constant as the corpus grows)
    "fuzzy_prefix_pairs",
    # two-phase band-then-refine weighted median: the banded window must
    # stay rollup-sized while the raw scan grows
    "weighted_median_price",
    # round-8 shapes: rolling COUNT DISTINCT via the contribution
    # explode (constant 7x fan-out of the per-day user vocabulary — the
    # explode must scale with distinct users, not the event stream),
    # and the dense-spine LOCF carry window (spine stays calendar-sized
    # while the fact table grows)
    "rolling_distinct_users",
    "locf_gap_fill",
    # round-6 shape: the exp-histogram rate path (max_by/min_by endpoint
    # agg + in-row reset folds + explode merge) after its equal-scale
    # fast-path rewrite — the one operator whose plan changed this round
    "exphist_rate_quantile",
    # round-8 shapes: the metric-native IR sub-model's two wide paths —
    # cumulative-run increase (runs grouped on (bucket, series,
    # start_ts), window over the run digest) and the histogram posting
    # explode (per-(bucket, series, idx) partial sums + CDF window) —
    # plus the O(words) zip_with bigram walk (the O(words^2) shape it
    # replaced measured 5x slower at sf0.1 alone), the vocab-bounded
    # source-pair join (cost must follow vocabulary, not documents),
    # and the typed-attribute migration + typed-int predicate (map-only
    # transform, must stay flat)
    "ir_metrics_rate_cumulative",
    "ir_metrics_histogram_quantile",
    "bigram_hapax_share",
    "source_vocab_jaccard",
    "typed_attr_int_predicate",
    # round-9 shapes: the IR binop equi-join over (bucket, series)
    # digests (both one-to-one raw-series matching and the aggregated
    # group_left share), the summary anchor read-back (one max_by
    # groupBy, no explode/join), the traces typed-attribute migration +
    # two-map typed predicate (map-only), and the distinct output stage
    # on the metric path (window partitioned by label VALUE — cost must
    # follow label cardinality, not the stream)
    "ir_metrics_vector_binop",
    "ir_metrics_binop_group_left",
    "ir_metrics_summary_quantile",
    "typed_attr_trace_predicate",
    "logql_distinct_stage",
    # round-10 shapes: the chunking fan-out (map-only posexplode whose
    # output is ~n_tokens/stride rows per doc — cost must follow token
    # volume, never shuffle text) and the metric-path unpack→logfmt
    # extraction chain (per-row regex/json expressions ahead of the
    # bucket agg — must stay a map-side pass)
    "doc_chunk_windows",
    "logql_unpack_metric_path",
    # ExactSubstr passage runs: pair volume must follow duplicated
    # content (shared-shingle df filter), never corpus size
    "shared_passage_extraction",
    # exact global shuffle rank: bucket-local windows + broadcast
    # offsets — the data-sized window must stay partitioned
    "epoch_shuffle_batches",
    # round-11 shapes: the flamegraph prefix-explode + one groupBy
    # behind /pyroscope/render (cost follows samples x stack depth; the
    # envelope itself is bounded by frame-path cardinality), and the
    # manifest write→compact cycle behind /ops/compact (two parity
    # commits + per-partition rewrite — commit cost must follow data,
    # file count stays partition-bounded)
    "api_pyroscope_render_envelope",
    "api_ops_compact_rewrite",
]
# Skew tier: the shapes that CLAIM skew-safety (salted two-phase agg,
# salted window top-k, unique-composite-key self-join, partial-agg
# per-trace verdict). The skewed build puts ~50% of rows on one hot
# key; the same 1.3 threshold applies against uniform 1x.
SKEW_PROBE_QUERIES = [
    "salted_agg",
    "logql_approx_topk",
    "service_graph",
    "trace_tail_sample",
    # r11: a hot service concentrates flamegraph weight on a handful of
    # frame paths — the partial+final aggregate must absorb it map-side
    "api_pyroscope_render_envelope",
]
SUPERLINEAR_THRESHOLD = 1.3
GEN_VERSION = 4  # bump when build_scaled's mutations change
HOT_TRACE_KEY = 50_000_000  # beyond every offset orderkey at any factor


def _marker_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_PROBE_COMPLETE.json")


def build_scaled(spark, src: str, out_dir: str, factor: int, skew: bool = False) -> None:
    """Uniform replication, or (``skew=True``) the same volume with the
    copies ``i >= factor // 2`` collapsed onto one hot key: lineitem
    copies land in a single giant trace (l_orderkey = HOT_TRACE_KEY,
    l_linenumber re-derived from the source (orderkey, linenumber) so
    span ids inside the hot trace keep the base duplicate rate instead
    of colliding into a quadratic join blowup), and events copies land
    on one hot ``event_type`` stream. ~50% of all rows share the hot
    key — the 100 TB hot-tenant/hot-metric failure mode."""
    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{out_dir}/{t}.parquet")

    def replicate(table: str, mutate):
        base = load_table(spark, src, table)
        copies = [mutate(base, i) for i in range(factor)]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        # one file per table mirrors the testdata layout the catalog expects
        out.coalesce(max(1, factor // 4)).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )

    hot_half = factor // 2  # copies >= hot_half carry the hot key

    # per-copy skew offset must exceed the derived-key range
    # (orderkey*10 + linenumber < KEY_SPAN*10 by the KEY_SPAN contract),
    # or copies would collide inside the giant trace and fan joins out
    # beyond the base duplicate rate; int32 l_linenumber bounds the
    # factor
    skew_span = KEY_SPAN * 10
    if skew and factor * skew_span > 2**31 - 1:
        raise ValueError(f"skew build supports factor <= {(2**31 - 1) // skew_span}")

    def _lineitem(df, i):
        df = df.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * KEY_SPAN))
        if skew and i >= hot_half:
            # unique-ish line numbers within the giant trace: derived
            # from the source composite key + a per-copy offset
            df = df.withColumn(
                "l_linenumber",
                (
                    (F.col("l_orderkey") - F.lit(i * KEY_SPAN)) * 10
                    + F.col("l_linenumber")
                    + F.lit(i * skew_span)
                ).cast("int"),
            ).withColumn("l_orderkey", F.lit(HOT_TRACE_KEY).cast("long"))
        return df

    def _events(df, i):
        df = df.withColumn(
            "event_id", F.col("event_id") + F.lit(i * KEY_SPAN)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * KEY_SPAN))
        if skew and i >= hot_half:
            df = df.withColumn("event_type", F.lit("hot_event"))
        return df

    replicate("lineitem", _lineitem)
    replicate(
        "orders",
        lambda df, i: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * KEY_SPAN)
        ),
    )
    replicate("events", _events)
    # a SUFFIX salt is not enough for dedup shapes: a 3-word-shingle
    # MinHash barely changes when only the tail shingles differ, so the
    # R copies of each doc would form genuine R-sized near-dup groups and
    # the probe would (correctly!) measure R^2 pair OUTPUT growth — a
    # data artifact, not the engine. Rotating the letter alphabet per
    # copy rewrites most words, so copies share almost no shingles.
    alpha = "aeiounrstl"

    def _rot_text(df, i):
        if i == 0:
            return F.col("text")
        rot = alpha[i % len(alpha):] + alpha[: i % len(alpha)]
        return F.translate(F.col("text"), alpha, rot)

    replicate(
        "documents",
        lambda df, i: df.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * KEY_SPAN)
        ).withColumn("text", _rot_text(df, i)),
    )
    replicate(
        "embeddings",
        lambda df, i: df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * KEY_SPAN)
        ).withColumn(
            "embedding",
            F.col("embedding")
            if i == 0
            else F.concat(
                F.array(
                    (F.element_at("embedding", 1) + F.lit(i * 1e-3)).cast("float")
                ),
                F.slice("embedding", 2, 10_000),
            ),
        ),
    )
    # completion marker LAST, keyed by (src, factor, skew, generator
    # version): an interrupted build, a different --src, or an older
    # generator must trigger a rebuild, not silently reuse
    with open(_marker_path(out_dir), "w") as fh:
        json.dump(
            {"src": os.path.abspath(src), "factor": factor, "gen": GEN_VERSION,
             "skew": skew},
            fh,
        )


def time_query(fn, spark, sf_dir: str, runs: int = 3) -> float:
    # min of 3: queries run back-to-back in one JVM, so a single GC pause
    # inherited from the previous query's churn can double one sample
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        # noop sink, not count(): count() lets Catalyst prune the entire
        # project list of map-only queries, which would time a column-less
        # row count instead of the operator being probed
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return best


def _ensure_scaled(spark, src: str, out: str, factor: int, skew: bool) -> str:
    scaled_dir = os.path.join(out, f"x{factor}" + ("skew" if skew else ""))
    marker = _marker_path(scaled_dir)
    expected = {"src": os.path.abspath(src), "factor": factor, "gen": GEN_VERSION,
                "skew": skew}
    have = None
    if os.path.exists(marker):
        with open(marker) as fh:
            have = json.load(fh)
    if have != expected:
        if os.path.isdir(scaled_dir):
            shutil.rmtree(scaled_dir)
        build_scaled(spark, src, scaled_dir, factor, skew=skew)
    return scaled_dir


def run_probe(
    spark,
    src: str = DEFAULT_SRC,
    out: str = "/tmp/signaldb_scale_probe",
    factor: int = 16,
    probe_queries: "list[str] | None" = None,
    emit=None,
    skew: bool = False,
) -> dict:
    emit = emit or (lambda s: print(s, flush=True))
    queries = all_queries()
    scaled_dir = _ensure_scaled(spark, src, out, factor, skew)

    queries["pricing_summary"](spark, src).count()  # warm JIT/footers

    results = {}
    worst = 0.0
    default = SKEW_PROBE_QUERIES if skew else PROBE_QUERIES
    for name in probe_queries or default:
        t1 = time_query(queries[name], spark, src)
        tr = time_query(queries[name], spark, scaled_dir)
        eff = tr / (factor * t1)
        worst = max(worst, eff)
        results[name] = {
            "t_1x_sec": round(t1, 3),
            f"t_{factor}x_sec": round(tr, 3),
            "efficiency": round(eff, 3),
        }
        emit(json.dumps({"query": name, **results[name]}))

    verdict = "linear" if worst <= SUPERLINEAR_THRESHOLD else "SUPERLINEAR"
    summary = {
        "metric": "scale_probe",
        "factor": factor,
        "skew": skew,
        "worst_efficiency": round(worst, 3),
        "threshold": SUPERLINEAR_THRESHOLD,
        "verdict": verdict,
        "queries": results,
    }
    emit(json.dumps(summary))
    return summary


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=16)
    ap.add_argument("--src", default=DEFAULT_SRC)
    ap.add_argument("--out", default="/tmp/signaldb_scale_probe")
    ap.add_argument(
        "--skew", action="store_true",
        help="also run the hot-key tier (50%% of rows on one key)",
    )
    ap.add_argument(
        "--skew-only", action="store_true",
        help="run only the hot-key tier",
    )
    ap.add_argument(
        "--queries", default=None,
        help="comma-separated subset to probe (default: the full tier)",
    )
    args = ap.parse_args()
    subset = args.queries.split(",") if args.queries else None

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    summaries = []
    if not args.skew_only:
        summaries.append(
            run_probe(spark, args.src, args.out, args.factor,
                      probe_queries=subset)
        )
    if args.skew or args.skew_only:
        summaries.append(
            run_probe(spark, args.src, args.out, args.factor,
                      probe_queries=subset, skew=True)
        )
    return 0 if all(s["verdict"] == "linear" for s in summaries) else 1


if __name__ == "__main__":
    raise SystemExit(main())
