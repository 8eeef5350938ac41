from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from arrowhouse_spark.operators.layout import zorder_value


def _np_morton(xs, ys, bits=16):
    def quant(v, mn, mx):
        return 0 if mx == mn else (v - mn) * ((1 << bits) - 1) // (mx - mn)

    out = []
    for x, y in zip(xs, ys):
        qx, qy = quant(x, min(xs), max(xs)), quant(y, min(ys), max(ys))
        z = 0
        for b in range(bits):
            z |= ((qx >> b) & 1) << (2 * b)
            z |= ((qy >> b) & 1) << (2 * b + 1)
        out.append(z)
    return out


def test_zorder_matches_python_interleave(spark):
    xs = [0, 3, 7, 100, 255]
    ys = [255, 100, 7, 3, 0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    got = {
        (r["x"], r["y"]): r["zvalue"]
        for r in zorder_value(df, ["x", "y"]).collect()
    }
    want = dict(zip(zip(xs, ys), _np_morton(xs, ys)))
    assert got == want


def test_zorder_constant_column_quantizes_to_zero(spark):
    df = spark.createDataFrame([(5, 1), (5, 2)], "x long, y long")
    rows = zorder_value(df, ["x", "y"]).collect()
    # x contributes nothing; z is the interleave of y's quantized bits only
    assert all(r["zvalue"] >= 0 for r in rows)
    z = {r["y"]: r["zvalue"] for r in rows}
    assert z[1] == 0  # y=min -> q=0
    assert z[2] > 0


def test_zorder_locality_beats_single_column_sort(spark):
    # the point of the curve: range-bucketing by zvalue bounds BOTH dims,
    # bucketing by x alone leaves y unbounded. Check that the top-8-bit
    # bucket's y-spread is far below the global y-range for a grid.
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = zorder_value(df, ["x", "y"]).collect()
    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for r in rows:
        by_bucket.setdefault(r["zvalue"] >> 26, []).append((r["x"], r["y"]))
    spreads = [
        (max(v for _, v in pts_) - min(v for _, v in pts_))
        for pts_ in by_bucket.values()
    ]
    assert len(by_bucket) > 16
    assert max(spreads) <= 16  # every bucket is a tight y-slab; global is 63


def test_zorder_width_guard():
    # 4 cols x 16 bits = 64 > 62: rejected before any plan is built
    with pytest.raises(ValueError, match="bits"):
        zorder_value(None, ["a", "b", "c", "d"], bits=16)


def test_decayed_agg_matches_closed_form(spark):
    from arrowhouse_spark.operators.timeseries import decayed_agg

    base = dt.datetime(2024, 1, 8)
    rows = [
        ("a", base, 10.0),                      # Δt=0  -> w=1
        ("a", base - dt.timedelta(hours=24), 8.0),   # w=2^-1
        ("a", base - dt.timedelta(hours=48), 4.0),   # w=2^-2
        ("b", base - dt.timedelta(hours=24), 6.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    got = {
        r["k"]: (r["decayed_sum"], r["decayed_count"], r["n"])
        for r in decayed_agg(
            df, key_cols=["k"], ts_col="ts", value_col="v",
            half_life_hours=24.0,
        ).collect()
    }
    assert got["a"] == (pytest.approx(10 + 4 + 1), pytest.approx(1.75), 3)
    assert got["b"] == (pytest.approx(3.0), pytest.approx(0.5), 1)


def test_hll_state_merge_equals_direct(spark):
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.aggstate import hll_merge, hll_state

    df = (
        spark.range(5000)
        .withColumn("day", (F.col("id") % 5).cast("int"))
        .withColumn("u", F.col("id") % 733)
    )
    states = hll_state(df, keys=["day"], value_col="u")
    merged = hll_merge(states, keys=[]).collect()[0]["approx_distinct"]
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("u", F.lit(14)))
    ).collect()[0][0]
    assert merged == direct
    assert abs(merged - 733) / 733 <= 0.05


def test_layout_manifest_and_pruning_win(spark):
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.layout import layout_manifest, zorder_value

    pts = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(pts, "x long, y long")
    z = zorder_value(df, ["x", "y"])
    man = layout_manifest(z, F.shiftright("zvalue", 26), ["x", "y"])
    rows = man.collect()
    assert sum(r["n_rows"] for r in rows) == 1024
    # z-order buckets are tight SQUARES: both dims bounded, so a point
    # predicate (x in [8,9], y in [8,9]) touches few buckets
    cand = [
        r
        for r in rows
        if r["min_x"] <= 9 and r["max_x"] >= 8 and r["min_y"] <= 9 and r["max_y"] >= 8
    ]
    assert len(cand) <= 4  # tight: 2x2 window falls in at most 4 z-squares
    assert len(rows) >= 16


def test_zorder_rejects_fractional_columns(spark):
    df = spark.createDataFrame([(1, 1.5)], "x long, y double")
    with pytest.raises(TypeError, match="fractional"):
        zorder_value(df, ["x", "y"])


def test_dq_empty_in_set_counts_all_non_null(spark):
    from arrowhouse_spark.operators.quality import dq_check

    df = spark.createDataFrame([("a",), ("b",), (None,)], "c string")
    out = dq_check(df, [("in_set", "c", ())]).collect()[0]
    assert out["violations"] == 2 and not out["passed"]


def test_merge_into_rejects_unknown_when_matched(spark):
    from arrowhouse_spark.operators.merge import merge_into

    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="when_matched"):
        merge_into(df, df, key_cols=["k"], when_matched="upsert")


def test_zorder_repartition_write_produces_tight_file_stats(spark, tmp_path):
    # the end goal of the layout rewrite: AFTER writing, each parquet
    # file's min/max footer stats bound BOTH dimensions, so a 2-D point
    # predicate hits few files on stats alone. The skipping metric is the
    # SUM of per-file bounding-box areas (= expected files scanned per
    # uniform point lookup x grid size): a random or 1-D layout gives
    # every file the full 64x64 box (total 8*4096); the z-layout keeps
    # most files in a ~32x16 box. A couple of range-boundary files
    # legitimately straddle Morton quadrants and go wide (same artifact
    # Delta's OPTIMIZE ZORDER has), so assert on the total, not the max.
    import glob

    import pyarrow.parquet as pq

    from arrowhouse_spark.operators.layout import zorder_repartition

    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = str(tmp_path / "zsorted")
    (
        zorder_repartition(df, ["x", "y"], num_partitions=8)
        .sortWithinPartitions("zvalue")
        .write.parquet(out)
    )
    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 4
    areas = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        stats = [
            [md.row_group(g).column(c).statistics for g in range(md.num_row_groups)]
            for c in (0, 1)
        ]
        spans = [
            max(s.max for s in col) - min(s.min for s in col) for col in stats
        ]
        areas.append((spans[0] + 1) * (spans[1] + 1))
    unclustered = len(files) * 64 * 64
    # z-layout: ~6 tight 32x16 files + <=2 quadrant-straddlers; well under
    # half the unclustered area, and at least one file must be tight
    assert sum(areas) < 0.5 * unclustered
    assert min(areas) <= 32 * 16


def test_hilbert_value_matches_xy2d_model_and_is_bijective(spark):
    """hilbert_value vs the canonical public-domain xy2d loop, on a grid
    sample whose min/max pin quantization to the identity."""
    import random

    import pytest
    from arrowhouse_spark.operators.layout import hilbert_value

    def xy2d(n, x, y):
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    rng = random.Random(7)
    pts = list({(rng.randrange(256), rng.randrange(256)) for _ in range(200)})
    pts += [(0, 0), (255, 255), (0, 255), (255, 0)]
    pts = list(dict.fromkeys(pts))
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.hvalue
        for r in hilbert_value(df, "x", "y", bits=8).collect()
    }
    assert all(got[(x, y)] == xy2d(256, x, y) for x, y in pts)
    assert len(set(got.values())) == len(pts)  # injective on the sample
    assert all(0 <= v < 256 * 256 for v in got.values())

    # Hilbert locality: the four corners of one quantized quadrant stay
    # within that quadrant's d-range (Morton would too, but the unit-step
    # property is what the manifest query measures end-to-end)
    with pytest.raises(TypeError):
        hilbert_value(
            spark.createDataFrame([(1.0, 2)], "x double, y long"), "x", "y"
        )
    with pytest.raises(ValueError):
        hilbert_value(df, "x", "y", bits=0)


def test_layout_quantization_survives_wide_spans(spark):
    """(x - mn) * qmax on BIGINT overflows when span * qmax > 2^63
    (epoch-micros coordinates at bits >= 13); the DECIMAL(38,0)
    intermediates keep the exact mul-then-div value at any long span.
    Scale invariance pins exactness: x and x*C quantize identically when
    both spans are exact multiples, so the curve keys must match
    row-for-row against the small-span (pre-fix-safe) dataset."""
    import random

    from arrowhouse_spark.operators.layout import hilbert_value, zorder_value

    rng = random.Random(11)
    q = 255  # bits=8 grid corners 0..255
    pts = list({(rng.randrange(q + 1), rng.randrange(q + 1)) for _ in range(120)})
    pts += [(0, 0), (q, q), (0, q), (q, 0)]
    pts = list(dict.fromkeys(pts))
    C = 10**14  # span q*C ~ 2.6e16; * qmax(65535 at bits=16) >> 2^63
    small = spark.createDataFrame(pts, "x long, y long")
    big = spark.createDataFrame([(x * C, y * C) for x, y in pts], "x long, y long")

    hs = {(r.x, r.y): r.hvalue for r in hilbert_value(small, "x", "y", bits=8).collect()}
    hb = {(r.x // C, r.y // C): r.hvalue for r in hilbert_value(big, "x", "y", bits=8).collect()}
    assert hs == hb

    zs = {(r.x, r.y): r.zvalue for r in zorder_value(small, ["x", "y"], bits=8).collect()}
    zb = {(r.x // C, r.y // C): r.zvalue for r in zorder_value(big, ["x", "y"], bits=8).collect()}
    assert zs == zb

    # bits=16 over an epoch-micros-scale span (the ADVICE repro shape):
    # must run without ARITHMETIC_OVERFLOW and stay within the grid
    ev = spark.createDataFrame(
        [(1_700_000_000_000_000 + i * 37_000_000_000, i) for i in range(64)],
        "ts_us long, k long",
    )
    hv = hilbert_value(ev, "ts_us", "k", bits=16).collect()
    assert all(0 <= r.hvalue < (1 << 32) for r in hv)
    zv = zorder_value(ev, ["ts_us", "k"], bits=16).collect()
    assert all(0 <= r.zvalue < (1 << 32) for r in zv)


def test_zorder_full_range_signed_span_no_overflow(spark):
    """The degenerate-span guard and quantization must survive a signed
    full-range column (mx - mn > 2^63, e.g. z-ordering by a raw xxhash64
    value) under ANSI mode — both the guard comparison and the decimal
    arithmetic."""
    from arrowhouse_spark.operators.layout import hilbert_value, zorder_value

    df = spark.createDataFrame(
        [(-5_000_000_000_000_000_000, 1), (5_000_000_000_000_000_000, 2),
         (0, 3), (123456789, 4)],
        "x long, k long",
    )
    zv = {r.k: r.zvalue for r in zorder_value(df, ["x", "k"], bits=8).collect()}
    assert len(zv) == 4 and all(0 <= v < (1 << 16) for v in zv.values())
    hv = {r.k: r.hvalue for r in hilbert_value(df, "x", "k", bits=8).collect()}
    assert len(hv) == 4 and all(0 <= v < (1 << 16) for v in hv.values())


def test_quant_expr_clamps_stale_bounds(spark):
    """zorder/hilbert freeze min/max as literals at call time; if the plan
    executes after the data changed, out-of-range inputs must degrade to
    the EDGE bucket (0 or qmax), never wrap under non-ANSI BIGINT
    arithmetic into corrupt curve keys (round-11 ADVICE). Pin both
    arithmetic branches."""
    from arrowhouse_spark.operators.layout import _quant_expr

    # BIGINT branch (span * qmax fits a long): bounds [0, 100], qmax 15
    df = spark.createDataFrame(
        [(-50,), (0,), (50,), (100,), (175,)], "x long"
    )
    got = [
        r.q
        for r in df.select("x", _quant_expr("x", 0, 100, 15).alias("q"))
        .orderBy("x")
        .collect()
    ]
    assert got == [0, 0, 7, 15, 15]  # -50 → 0, 175 → 15 (edge buckets)

    # DECIMAL branch (span * qmax > 2^63): bounds [0, 1e18], qmax 65535
    big = spark.createDataFrame(
        [(-7,), (0,), (500_000_000_000_000_000,), (2_000_000_000_000_000_000,)],
        "x long",
    )
    gotd = [
        r.q
        for r in big.select(
            "x", _quant_expr("x", 0, 10**18, 65535).alias("q")
        )
        .orderBy("x")
        .collect()
    ]
    assert gotd == [0, 0, 32767, 65535]


def test_quant_expr_null_propagates_not_edge_bucket(spark):
    """Spark's least/greatest SKIP nulls, so an unguarded clamp would
    quantize a NULL dimension to the min edge (bucket 0) — silently
    relocating NULL rows and diverging from any engine replaying the
    unclamped arithmetic (round-12 ADVICE). The CASE WHEN guard must
    keep NULL → NULL in BOTH arithmetic branches."""
    from arrowhouse_spark.operators.layout import _quant_expr

    df = spark.createDataFrame([(None,), (0,), (100,)], "x long")
    got = {
        r.x: r.q
        for r in df.select(
            "x", _quant_expr("x", 0, 100, 15).alias("q")
        ).collect()
    }
    assert got[None] is None and got[0] == 0 and got[100] == 15

    gotd = {
        r.x: r.q
        for r in df.select(
            "x", _quant_expr("x", 0, 10**18, 65535).alias("q")
        ).collect()
    }
    assert gotd[None] is None and gotd[0] == 0

    # degenerate span (mx == mn) and unknown bounds (all-NULL column)
    # must keep the same contract: non-NULL -> bucket 0, NULL -> NULL
    for mn, mx in ((7, 7), (None, None)):
        gdeg = {
            r.x: r.q
            for r in df.select(
                "x", _quant_expr("x", mn, mx, 15).alias("q")
            ).collect()
        }
        assert gdeg[None] is None and gdeg[0] == 0 and gdeg[100] == 0
