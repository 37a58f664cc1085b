"""asof_join unit tests: direction semantics, equal-timestamp
inclusion, tolerance nulling, unmatched rows."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from signaldb_spark.operators.temporal import asof_join


def _sides(spark):
    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0, 0), "l1"),
            (1, datetime(2024, 1, 1, 12, 0, 0), "l2"),
            (2, datetime(2024, 1, 1, 9, 0, 0), "l3"),
        ],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 30, 0), "r1"),
            (1, datetime(2024, 1, 1, 12, 0, 0), "r2"),  # equal-ts with l2
            (2, datetime(2024, 1, 1, 11, 0, 0), "r3"),  # after k=2's left row
        ],
        "k int, ts timestamp, rv string",
    )
    return left, right


def test_backward_picks_latest_at_or_before(spark):
    left, right = _sides(spark)
    out = {
        r["lv"]: r["r_rv"]
        for r in asof_join(left, right, ["k"], direction="backward").collect()
    }
    assert out == {"l1": "r1", "l2": "r2", "l3": None}


def test_forward_picks_earliest_at_or_after(spark):
    left, right = _sides(spark)
    out = {
        r["lv"]: r["r_rv"]
        for r in asof_join(left, right, ["k"], direction="forward").collect()
    }
    assert out == {"l1": "r2", "l2": "r2", "l3": "r3"}


def test_tolerance_nulls_stale_matches(spark):
    left, right = _sides(spark)
    out = {
        r["lv"]: (r["r_rv"], r["r_ts"])
        for r in asof_join(
            left, right, ["k"], direction="backward", tolerance_seconds=600
        ).collect()
    }
    # l1 at 10:00 matched r1 at 9:30 — 30 min > 10 min tolerance -> nulled
    assert out["l1"] == (None, None)
    # equal timestamps are distance 0 -> kept
    assert out["l2"][0] == "r2"


def test_interval_join_matches_naive_range_join(spark):
    """Property: the bucketed interval join returns exactly the pairs a
    naive range join finds, across boundary-straddling timestamps and
    both window shapes."""
    import random

    from pyspark.sql import functions as F

    from signaldb_spark.operators.temporal import interval_join

    rnd = random.Random(11)
    left = [(rnd.randrange(5), float(rnd.randrange(0, 20_000)), i) for i in range(300)]
    right = [(rnd.randrange(5), float(rnd.randrange(0, 20_000)), i) for i in range(300)]
    l = spark.createDataFrame(left, "k long, ts double, lid long")
    r = spark.createDataFrame(right, "k long, r_ts double, rid long")
    for before, after in ((3600, 0), (1800, 900), (0, 100)):
        got = {
            (x.lid, x.rid)
            for x in interval_join(
                l, r, ["k"], "ts", "r_ts",
                before_seconds=before, after_seconds=after,
            ).collect()
        }
        want = {
            (lid, rid)
            for (lk, lts, lid) in left
            for (rk, rts, rid) in right
            if lk == rk and lts - before <= rts <= lts + after
        }
        assert got == want, (before, after, len(got), len(want))


# --------------------------------------------------- URL canonicalization


def test_canonicalize_url_edge_cases(spark):
    from pyspark.sql import functions as F

    from signaldb_spark.operators.urls import canonicalize_url

    cases = [
        # (raw, canonical)
        ("HTTP://WWW.Ex.COM:80/A/b/", "http://ex.com/A/b"),
        ("https://ex.com:443/", "https://ex.com/"),          # root slash kept
        ("https://ex.com:8080/x", "https://ex.com:8080/x"),  # non-default port kept
        ("ex.com/x?utm_source=a", "https://ex.com/x"),       # scheme default
        ("https://ex.com/x?b=2&a=1#frag", "https://ex.com/x?a=1&b=2"),
        ("https://ex.com", "https://ex.com"),                # empty path
        ("https://ex.com/x?utm_campaign=1&utm_source=2", "https://ex.com/x"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "raw string")
    got = [r.c for r in df.select(canonicalize_url(F.col("raw")).alias("c")).collect()]
    assert got == [c for _, c in cases]


def test_repeated_ngram_interval_union_hand_check(spark):
    """Within-doc repeat of an 8-gram at pos 0 and 9 (overlap-free) →
    16 masked tokens; overlapping repeats (pos 0 and 4) union to 12."""
    from signaldb_spark.operators.corpus import repeated_ngram_stats

    eight = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (1, f"{eight} x {eight}"),            # repeats at 0 and 9
            (2, f"a b c d a b c d a b c d"),      # 8-grams at 0..4; 0 and 4 identical
            (3, "nothing repeated here at all ok fine done"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repeated_ngram_stats(docs, "doc_id", "text").collect()}
    assert out[1].repeated_windows == 2 and out[1].masked_tokens == 16
    # doc 2: "a b c d a b c d a b c d" tokens 12; windows at pos 0..4;
    # pos 0 and 4 are both "a b c d a b c d" → hot; union [0,8)∪[4,12) = 12
    assert out[2].repeated_windows == 2 and out[2].masked_tokens == 12
    assert out[3].repeated_windows == 0 and out[3].masked_tokens == 0
    assert out[3].repeated_frac == 0.0


def test_nearest_picks_closer_side_tie_backward(spark):
    from datetime import datetime

    from signaldb_spark.operators.temporal import asof_nearest

    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0, 0), "l1"),   # r at 9:50 and 10:30
            (1, datetime(2024, 1, 1, 12, 0, 0), "l2"),   # equidistant 11:30/12:30
            (2, datetime(2024, 1, 1, 9, 0, 0), "l3"),    # only forward exists
        ],
        "k int, ts timestamp, lv string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 50, 0), "back_near"),
            (1, datetime(2024, 1, 1, 10, 30, 0), "fwd_far"),
            (1, datetime(2024, 1, 1, 11, 30, 0), "tie_back"),
            (1, datetime(2024, 1, 1, 12, 30, 0), "tie_fwd"),
            (2, datetime(2024, 1, 1, 9, 45, 0), "only_fwd"),
        ],
        "k int, ts timestamp, rv string",
    )
    out = {
        r["lv"]: r["r_rv"] for r in asof_nearest(left, right, ["k"]).collect()
    }
    assert out == {
        "l1": "back_near",  # 10 min back beats 30 min fwd
        "l2": "tie_back",   # exact tie -> backward
        "l3": "only_fwd",   # no backward candidate
    }


def test_nearest_tolerance_applies_to_picked_match(spark):
    from datetime import datetime

    from signaldb_spark.operators.temporal import asof_nearest

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0, 0), "l1")], "k int, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 9, 0, 0), "r1")], "k int, ts timestamp, rv string"
    )
    out = asof_nearest(left, right, ["k"], tolerance_seconds=600).collect()
    assert out[0]["r_rv"] is None and out[0]["r_ts"] is None


def test_nearest_single_window_pass(spark):
    """Both frames share one partition+sort: exactly one Exchange and
    one Sort in the physical plan — the single-shuffle claim."""
    from datetime import datetime

    from signaldb_spark.operators.temporal import asof_nearest

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "a")], "k int, ts timestamp, lv string"
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), "b")], "k int, ts timestamp, rv string"
    )
    plan = (
        asof_nearest(left, right, ["k"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
