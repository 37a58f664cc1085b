"""Round-3 additions: real-decoder escape hatch (Pillow-gated),
attr-promotion streak hysteresis, and demand recording at the PromQL /
TraceQL query sites."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- multimodal real decode


def test_real_decoder_with_pillow(spark):
    """Exercises the REAL decode path when Pillow is installed (skipped
    in containers without it); the Spark-side plumbing — schema,
    batching, UDF signature — is identical to the fake path."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from signaldb_spark.operators.multimodal import extract_features

    buf = io.BytesIO()
    Image.new("L", (12, 7), color=128).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "media_id long, payload binary"
    )
    row = extract_features(media, use_real_decoder=True).collect()[0]
    assert (row.width, row.height) == (12, 7)
    assert abs(row.brightness - 128 / 255) < 1e-6


def _bmp_24(width, height, pixel_rows):
    """Hand-assemble an uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up). pixel_rows: top-down rows of (r, g, b) tuples."""
    import struct

    row_size = ((24 * width + 31) // 32) * 4
    raster = b""
    for row in reversed(pixel_rows):  # BMP stores bottom-up
        line = b"".join(bytes((b, g, r)) for r, g, b in row)  # BGR order
        raster += line + b"\x00" * (row_size - len(line))
    pix_off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(raster), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(raster), 2835, 2835, 0, 0)
    return hdr + info + raster


def test_bmp_decodes_natively_no_libraries(spark):
    """24-bit BMP decodes through REAL pixel parsing with no image
    libraries installed — exact dimensions and mean brightness."""
    from signaldb_spark.operators.multimodal import extract_features

    pixels = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    payload = _bmp_24(3, 2, pixels)
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = extract_features(media, use_real_decoder=True).collect()[0]
    assert (row.width, row.height) == (3, 2)
    flat = [c for r in pixels for px in r for c in px]
    assert abs(row.brightness - (sum(flat) / len(flat)) / 255) < 1e-6


def test_pnm_decodes_natively_with_header_comment(spark):
    """Binary P6 (RGB) and P5 (gray, with a # comment in the header)
    decode natively; brightness is the exact sample mean / maxval."""
    from signaldb_spark.operators.multimodal import extract_features

    p6 = b"P6\n2 2\n255\n" + bytes(range(12))  # 2x2 RGB, samples 0..11
    p5 = b"P5\n# a comment\n4 1\n200\n" + bytes([0, 50, 100, 200])
    media = spark.createDataFrame(
        [(1, bytearray(p6)), (2, bytearray(p5))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in
            extract_features(media, use_real_decoder=True).collect()}
    assert (rows[1].width, rows[1].height) == (2, 2)
    assert abs(rows[1].brightness - (sum(range(12)) / 12) / 255) < 1e-6
    assert (rows[2].width, rows[2].height) == (4, 1)
    assert abs(rows[2].brightness - (350 / 4) / 200) < 1e-6


def test_pnm_crlf_header_does_not_shift_raster():
    """A Windows-written P5 (CRLF after maxval) must not silently read
    the leftover newline as the first sample."""
    from signaldb_spark.operators.multimodal import _decode_pnm

    w, h, br = _decode_pnm(b"P5\r\n2 1\r\n255\r\n" + bytes([100, 200]))
    assert (w, h) == (2, 1)
    assert abs(br - (300 / 2) / 255) < 1e-9
    # truncated header (no whitespace after maxval) falls through, not garbage
    assert _decode_pnm(b"P5\n2 1\n255") is None


def test_real_decode_geometry_feeds_resize(spark):
    """resize_media with the real decoder: an 8x6 BMP fits into a 4x4
    box preserving aspect (4x3)."""
    from signaldb_spark.operators.multimodal import resize_media

    payload = _bmp_24(8, 6, [[(100, 100, 100)] * 8 for _ in range(6)])
    media = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    row = resize_media(media, 4, 4, use_real_decoder=True).collect()[0]
    assert (row.width, row.height) == (8, 6)
    assert (row.out_width, row.out_height) == (4, 3)


def test_fake_decoder_unchanged(spark):
    from signaldb_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [(1, bytearray(b"abcd"))], "media_id long, payload binary"
    )
    row = extract_features(media).collect()[0]
    assert (row.width, row.height, row.n_bytes) == (4 + 32, 32, 4)


# ------------------------------------------------- promotion hysteresis


def _stats(spark, rows):
    return spark.createDataFrame(
        rows, "key string, cardinality long, presence_ratio double"
    )


def test_promotion_streak_hysteresis(spark, tmp_path):
    """A key must stay over threshold for promote_streak consecutive
    cycles before promotion; a demoted-budget cycle demotes zero-demand
    materialized keys (attr_promotion.rs:82-153 policy)."""
    from signaldb_spark.maintenance.promotion import (
        PromotionConfig,
        StreakStore,
        promotion_cycle,
    )

    store = StreakStore(str(tmp_path / "logs"))
    cfg = PromotionConfig(promote_streak=3, max_labels_per_table=4)
    stats = _stats(spark, [("env", 3, 0.9), ("request_id_12345678", 900, 0.9)])
    demand = {"env": 10, "request_id_12345678": 50}

    d1 = promotion_cycle(stats, store, demand, config=cfg)
    assert d1.promote == [] and d1.building == [("env", 1)]
    d2 = promotion_cycle(stats, store, demand, config=cfg)
    assert d2.promote == [] and d2.building == [("env", 2)]
    d3 = promotion_cycle(stats, store, demand, config=cfg)
    # third consecutive over-threshold cycle → promoted; the
    # generated-looking key (8+ digit run) never builds a streak
    assert d3.promote == ["env"] and d3.building == []

    # a threshold miss RESETS the streak — one good cycle after it is
    # not enough again
    d4 = promotion_cycle(stats, store, {}, config=cfg)
    assert d4.promote == [] and d4.building == []
    d5 = promotion_cycle(stats, store, demand, config=cfg)
    assert d5.promote == [] and d5.building == [("env", 1)]


def test_promotion_budget_and_demote(spark, tmp_path):
    from signaldb_spark.maintenance.promotion import (
        PromotionConfig,
        StreakStore,
        promotion_cycle,
    )

    store = StreakStore(str(tmp_path / "logs"))
    cfg = PromotionConfig(promote_streak=1, max_labels_per_table=3)
    stats = _stats(
        spark, [("a", 5, 0.9), ("b", 5, 0.8), ("c", 5, 0.7), ("d", 5, 0.6)]
    )
    demand = {"a": 9, "b": 8, "c": 7, "d": 6}
    # width budget 3 minus 2 already-materialized = headroom 1: only the
    # highest-scoring candidate promotes
    d = promotion_cycle(
        stats, store, demand, materialized=("x", "y"), pinned=("x",), config=cfg
    )
    assert d.promote == ["a"]
    # y is materialized, unpinned, and has zero demand this cycle → demote;
    # pinned x is never demoted even with zero demand
    assert d.demote == ["y"]

    # shrinking budget to the current width stops all promotion
    cfg2 = PromotionConfig(promote_streak=1, max_labels_per_table=2)
    d2 = promotion_cycle(
        stats, store, demand, materialized=("x", "y"), pinned=("x",), config=cfg2
    )
    assert d2.promote == [] and d2.demote == ["y"]


# --------------------------------------------- demand recording (query sites)


def test_promql_query_records_demand(spark):
    from signaldb_spark.maintenance import attr_demand
    from signaldb_spark.promql.lowering import PromCtx, query_range

    gauge = spark.createDataFrame(
        [("2024-01-01 00:10:00", "api", "cpu", 1.0, {"pod": "p1"})],
        "timestamp string, service_name string, metric_name string,"
        " value double, attributes map<string,string>",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    ctx = PromCtx(
        spark, gauge, None, None,
        "2024-01-01 00:00:00", "2024-01-01 01:00:00", 3600,
        tenant="t1", dataset="d1",
    )
    attr_demand.drain()
    query_range(ctx, 'sum(cpu{pod="p1", job="api"})')
    demand = attr_demand.demand_map("t1", "d1", "metrics")
    # pod falls through to the attributes map → recorded; job is
    # well-known (service_name column) → not recorded
    assert demand == {"pod": 1}


def test_traceql_query_records_demand(spark):
    from signaldb_spark.maintenance import attr_demand
    from signaldb_spark.traceql.trace_ops import search_traceql

    spans = spark.createDataFrame(
        [
            ("t1", 1, "GET /a", "api", 100, 5_000_000, "2024-01-01",
             {"qty": "40"}, {"env": "prod"}),
            ("t1", 2, "GET /b", "api", 90, 1_000_000, "2024-01-01",
             {"qty": "10"}, {"env": "prod"}),
        ],
        "trace_id string, span_id long, span_name string, service_name string,"
        " start_time_unix_nano long, duration_nanos long, timestamp string,"
        " span_attributes map<string,string>, resource_attributes map<string,string>",
    )
    attr_demand.drain()
    out = search_traceql(
        spans,
        '{ name =~ "GET.*" && span.qty >= 30 } || { resource.env != "prod" }',
        tenant="t2",
        dataset="d2",
    ).collect()
    assert [r.span_id for r in out] == [1]  # only the qty>=30 span
    assert attr_demand.demand_map("t2", "d2", "traces") == {"qty": 1, "env": 1}
    # duration matcher end-to-end
    fast = search_traceql(spans, "{ duration < 2ms }").collect()
    assert [r.span_id for r in fast] == [2]


def test_demand_to_promotion_loop_e2e(spark, tmp_path):
    """The full promotion loop the reference runs through its catalog
    flusher: query-site demand recording → attribute_stats → streak
    hysteresis cycles → promote decision."""
    from signaldb_spark.maintenance import attr_demand
    from signaldb_spark.maintenance.jobs import attribute_stats
    from signaldb_spark.maintenance.promotion import (
        PromotionConfig,
        StreakStore,
        promotion_cycle,
    )
    from signaldb_spark.promql.lowering import PromCtx, query_range

    gauge = spark.createDataFrame(
        [
            ("2024-01-01 00:10:00", "api", "cpu", 1.0, {"pod": "p1", "env": "prod"}),
            ("2024-01-01 00:20:00", "api", "cpu", 2.0, {"pod": "p2", "env": "prod"}),
        ],
        "timestamp string, service_name string, metric_name string,"
        " value double, attributes map<string,string>",
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    ctx = PromCtx(
        spark, gauge, None, None,
        "2024-01-01 00:00:00", "2024-01-01 01:00:00", 3600,
        tenant="tl", dataset="dl",
    )
    store = StreakStore(str(tmp_path / "metrics"))
    cfg = PromotionConfig(promote_streak=2, min_presence_ratio=0.5)
    stats = attribute_stats(gauge, "attributes", exact=True)
    decision = None
    for _ in range(2):
        attr_demand.drain()
        query_range(ctx, 'sum(cpu{pod="p1"})')  # records demand for pod
        demand = attr_demand.demand_map("tl", "dl", "metrics")
        decision = promotion_cycle(stats, store, demand, config=cfg)
    # pod hit the 2-cycle streak → promoted; env (present everywhere but
    # never queried) stays unpromoted
    assert decision.promote == ["pod"]
    assert all(k != "env" for k, _ in decision.building)
