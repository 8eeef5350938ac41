from __future__ import annotations

import pytest

from arrowhouse_spark.operators.aggstate import agg_merge, agg_state

OPS = [("v", "count"), ("v", "sum"), ("v", "min"), ("v", "max"), ("v", "avg")]


def _df(spark):
    rows = [
        ("a", 1, 10.0),
        ("a", 1, 2.0),
        ("a", 2, 5.0),
        ("b", 1, 7.0),
        ("b", 2, None),  # null: count skips it, min/max ignore it
    ]
    return spark.createDataFrame(rows, "k string, day int, v double")


def test_two_phase_equals_single_shot(spark):
    df = _df(spark)
    states = agg_state(df, keys=["k", "day"], ops=OPS)
    final = {r["k"]: r for r in agg_merge(states, keys=["k"], ops=OPS).collect()}
    assert final["a"]["count_v"] == 3
    assert final["a"]["sum_v"] == pytest.approx(17.0)
    assert final["a"]["min_v"] == 2.0
    assert final["a"]["max_v"] == 10.0
    assert final["a"]["avg_v"] == pytest.approx(17.0 / 3)
    assert final["b"]["count_v"] == 1
    assert final["b"]["avg_v"] == pytest.approx(7.0)


def test_merge_of_merges_is_associative(spark):
    # fold day-1 states and day-2 states SEPARATELY (keeping day in keys),
    # then merge the union — must equal merging everything at once
    df = _df(spark)
    s1 = agg_state(df.filter("day = 1"), keys=["k", "day"], ops=OPS)
    s2 = agg_state(df.filter("day = 2"), keys=["k", "day"], ops=OPS)
    incremental = agg_merge(s1.unionByName(s2), keys=["k"], ops=OPS)
    oneshot = agg_merge(
        agg_state(df, keys=["k", "day"], ops=OPS), keys=["k"], ops=OPS
    )
    a = {tuple(r) for r in incremental.collect()}
    b = {tuple(r) for r in oneshot.collect()}
    assert a == b


def test_avg_only_drops_helper_states(spark):
    df = _df(spark)
    states = agg_state(df, keys=["k"], ops=[("v", "avg")])
    assert set(states.columns) == {"k", "sum_v", "count_v"}
    out = agg_merge(states, keys=["k"], ops=[("v", "avg")])
    assert set(out.columns) == {"k", "avg_v"}
    got = {r["k"]: r["avg_v"] for r in out.collect()}
    assert got["a"] == pytest.approx(17.0 / 3)


def test_unknown_op_rejected(spark):
    with pytest.raises(ValueError, match="unsupported state op"):
        agg_state(_df(spark), keys=["k"], ops=[("v", "median")])


def test_salted_join_equals_plain_join(spark):
    from arrowhouse_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (1, 30.0), (2, 5.0), (3, 7.0)], "k long, v double"
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y"), (4, "z")], "k long, d string")
    plain = {tuple(r) for r in fact.join(dim, "k").collect()}
    salted = {
        tuple(r) for r in salted_join(fact, dim, on=["k"], salt=4).collect()
    }
    assert salted == plain
    # left join keeps unmatched fact rows exactly once
    plain_l = sorted(tuple(r) for r in fact.join(dim, "k", "left").collect())
    salted_l = sorted(
        tuple(r) for r in salted_join(fact, dim, on=["k"], how="left", salt=4).collect()
    )
    assert salted_l == plain_l


def test_salted_join_rejects_right_outer(spark):
    from arrowhouse_spark.operators.skew import salted_join

    df = spark.range(1).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, on=["k"], how="right")


def test_cms_merge_equals_direct_and_never_underestimates(spark):
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.aggstate import (
        cms_merge,
        cms_point_estimate,
        cms_state,
    )

    rows = [(d, u) for d in (1, 2) for u in [7] * 5 + [11] * 3 + [13]]
    df = spark.createDataFrame(rows, "day int, u long")
    # day-split states folded ...
    merged = cms_merge(
        cms_state(df, keys=["day"], value_col="u"), keys=[]
    )
    # ... must equal the direct keyless sketch counter-for-counter
    direct = cms_state(df, keys=[], value_col="u")
    assert (
        merged.exceptAll(direct).count() == 0
        and direct.exceptAll(merged).count() == 0
    )
    probes = spark.createDataFrame([(7,), (11,), (13,), (99,)], "u long")
    est = {
        r["u"]: r["est"]
        for r in cms_point_estimate(merged, probes, "u").collect()
    }
    exact = {7: 10, 11: 6, 13: 2, 99: 0}
    for u, n in exact.items():
        assert est[u] >= n  # the CM overestimate guarantee
    # 4 distinct items in 4x512 counters: collisions impossible -> exact
    assert est == exact


def test_cms_depth_guard(spark):
    from arrowhouse_spark.operators.aggstate import cms_state

    df = spark.createDataFrame([(1,)], "u long")
    with pytest.raises(ValueError, match="depth"):
        cms_state(df, keys=[], value_col="u", depth=9)


def test_cms_point_estimate_rejects_keyed_state(spark):
    # round-7 advice: a keyed state joined on (row, bucket) alone would
    # silently SUM counters across all key groups and inflate every
    # estimate — must raise, pointing at cms_merge(keys=[])
    from arrowhouse_spark.operators.aggstate import cms_point_estimate, cms_state

    df = spark.createDataFrame([(1, 7), (2, 7)], "day int, u long")
    keyed = cms_state(df, keys=["day"], value_col="u")
    probes = spark.createDataFrame([(7,)], "u long")
    with pytest.raises(ValueError, match="keyless"):
        cms_point_estimate(keyed, probes, "u")


def test_hist_state_merge_and_interpolated_quantiles(spark):
    from arrowhouse_spark.operators.aggstate import (
        hist_merge,
        hist_quantile,
        hist_state,
    )

    # 100 uniform values 0..99 split across two days; 10 bins of width 10
    rows = [(i % 2, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "day int, v double")
    states = hist_state(df, keys=["day"], value_col="v", bins=10, lo=0.0, hi=100.0)
    merged = hist_merge(states, keys=[])
    direct = hist_state(df, keys=[], value_col="v", bins=10, lo=0.0, hi=100.0)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    est = {
        r["q"]: r["est"]
        for r in hist_quantile(
            merged, [0.5, 0.95], bins=10, lo=0.0, hi=100.0
        ).collect()
    }
    # bin 4 holds values 40..49: cum_before=40, target=50 -> est exactly 50
    assert est[0.5] == pytest.approx(50.0)
    # target=95 lands mid-bin-9: est = (9 + 5/10) * 10 = 95
    assert est[0.95] == pytest.approx(95.0)


def test_hist_quantile_q_zero_returns_first_bin_edge(spark):
    # round-7 advice: q=0's target=0 never satisfies cum_before < target,
    # so the row silently vanished; it must return the low edge of the
    # first POPULATED bin (q=1 exercises the ordinary top-edge branch)
    from arrowhouse_spark.operators.aggstate import hist_quantile, hist_state

    rows = [(float(v),) for v in range(23, 87)]
    df = spark.createDataFrame(rows, "v double")
    st = hist_state(df, keys=[], value_col="v", bins=10, lo=0.0, hi=100.0)
    est = {
        r["q"]: r["est"]
        for r in hist_quantile(st, [0.0, 1.0], bins=10, lo=0.0, hi=100.0).collect()
    }
    # first populated bin is 2 (values 23..29): q=0 -> its low edge, 20
    assert est[0.0] == pytest.approx(20.0)
    assert 80.0 <= est[1.0] <= 90.0  # top value 86 sits in bin 8
    # empty state: no quantile of nothing, for any q
    empty = st.filter("cnt < 0")
    assert hist_quantile(empty, [0.0, 0.5], bins=10, lo=0.0, hi=100.0).count() == 0


def test_hist_state_clamps_out_of_domain_and_keys(spark):
    from arrowhouse_spark.operators.aggstate import hist_quantile, hist_state

    rows = [("a", -5.0), ("a", 500.0), ("a", 5.0), ("b", 95.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    st = hist_state(df, keys=["k"], value_col="v", bins=10, lo=0.0, hi=100.0)
    got = {(r["k"], r["bin"]): r["cnt"] for r in st.collect()}
    # -5 clamps to bin 0 (with 5.0), 500 clamps to bin 9
    assert got[("a", 0)] == 2 and got[("a", 9)] == 1 and got[("b", 9)] == 1
    # keyed quantiles stay per-key
    est = {
        (r["k"], r["q"]): r["est"]
        for r in hist_quantile(
            st, [0.5], bins=10, lo=0.0, hi=100.0, keys=["k"]
        ).collect()
    }
    assert ("a", 0.5) in est and ("b", 0.5) in est
    # b's only mass is bin 9: est = (9 + (0.5*1 - 0)/1) * 10 = 95
    assert est[("b", 0.5)] == pytest.approx(95.0)


def test_bloom_merge_equals_direct_and_no_false_negatives(spark):
    from arrowhouse_spark.operators.aggstate import (
        bloom_merge,
        bloom_probe,
        bloom_state,
    )

    df = spark.createDataFrame(
        [(d, v) for d in range(3) for v in range(d * 40, d * 40 + 50)],
        "day int, v long",
    )
    merged = bloom_merge(bloom_state(df, ["day"], "v"), [])
    direct = bloom_state(df.select("v"), [], "v")
    assert {(r["word"], r["bits"]) for r in merged.collect()} == {
        (r["word"], r["bits"]) for r in direct.collect()
    }

    probes = spark.createDataFrame([(v,) for v in range(0, 400, 3)], "q long")
    got = {
        r["q"]: r["member"]
        for r in bloom_probe(merged, probes, "q").collect()
    }
    members = set(range(130))
    # contract: NO false negatives, ever
    assert all(got[q] for q in got if q in members)


def test_bloom_probe_rejects_keyed_state_and_bad_params(spark):
    import pytest
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.aggstate import (
        bloom_probe,
        bloom_state,
    )

    df = spark.createDataFrame([(1, 5)], "day int, v long")
    keyed = bloom_state(df, ["day"], "v")
    probes = spark.createDataFrame([(5,)], "q long")
    with pytest.raises(ValueError, match="keyless"):
        bloom_probe(keyed, probes, "q")
    with pytest.raises(ValueError):
        bloom_state(df, [], "v", depth=9)
    with pytest.raises(ValueError):
        bloom_state(df, [], "v", n_words=0)
    with pytest.raises(TypeError):
        bloom_state(df.select(F.col("v").cast("string")), [], "v")


def test_bloom_empty_state_probes_all_false(spark):
    from arrowhouse_spark.operators.aggstate import bloom_probe, bloom_state

    empty = bloom_state(
        spark.createDataFrame([], "v long"), [], "v"
    )
    probes = spark.createDataFrame([(1,), (2,)], "q long")
    got = {r["q"]: r["member"] for r in bloom_probe(empty, probes, "q").collect()}
    assert got == {1: False, 2: False}


def test_minhash_sig_merge_equals_direct_and_estimates(spark):
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.aggstate import (
        minhash_sig_jaccard,
        minhash_sig_merge,
        minhash_sig_state,
    )

    # two groups with known overlap: 50 shared tokens, 50 unique each
    # -> true Jaccard = 50/150
    rows = [("g1", f"t{i}") for i in range(100)] + [
        ("g2", f"t{i}") for i in range(50, 150)
    ]
    df = spark.createDataFrame(rows, "g string, tok string")
    direct = minhash_sig_state(df, ["g"], "tok", depth=64)
    # split into halves, build per-half states, merge
    batched = df.withColumn("half", F.length("tok") % 2)
    merged = minhash_sig_merge(
        minhash_sig_state(batched, ["g", "half"], "tok", depth=64), ["g"]
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )

    est = minhash_sig_jaccard(direct, "g").collect()
    [(ka, kb, e)] = [(r["key_a"], r["key_b"], r["est"]) for r in est]
    assert (ka, kb) == ("g1", "g2")
    # 64 rows: estimate should land within ~4 sigma of 1/3
    assert abs(e - 1 / 3) < 0.25

    # duplicated tokens cannot change a MIN-based signature
    dup = minhash_sig_state(df.union(df), ["g"], "tok", depth=64)
    assert sorted(map(tuple, dup.collect())) == sorted(
        map(tuple, direct.collect())
    )

    # denominator is DERIVED from the state (round-8 advice): truncating
    # one key's signature to depth 32 must rescale the estimate to the
    # 32 comparable rows, not silently halve it against a claimed 64
    ragged = direct.filter((F.col("g") == "g2") | (F.col("r") < 32))
    matches = (
        direct.filter(F.col("r") < 32)
        .groupBy("r")
        .pivot("g", ["g1", "g2"])
        .agg(F.first("minv"))
        .filter(F.col("g1") == F.col("g2"))
        .count()
    )
    [(ka, kb, e32)] = [
        (r["key_a"], r["key_b"], r["est"])
        for r in minhash_sig_jaccard(ragged, "g").collect()
    ]
    assert (ka, kb) == ("g1", "g2")
    assert e32 == matches / 32

    import pytest

    with pytest.raises(ValueError):
        minhash_sig_state(df, ["g"], "tok", depth=0)


def test_cms_inner_product_never_underestimates(spark):
    from arrowhouse_spark.operators.aggstate import (
        cms_inner_product,
        cms_state,
    )

    a = spark.createDataFrame([(k,) for k in [1] * 5 + [2] * 3 + [9]], "k long")
    b = spark.createDataFrame([(k,) for k in [1] * 2 + [2] * 4 + [7]], "k long")
    est = cms_inner_product(cms_state(a, [], "k"), cms_state(b, [], "k"))
    [(v,)] = est.collect()
    exact = 5 * 2 + 3 * 4  # keys 1 and 2 overlap; 9 and 7 do not
    assert v >= exact
    # 4 distinct keys across 4x512 counters: no collisions -> exact
    assert v == exact

    import pytest

    keyed = cms_state(a.withColumn("day", a.k % 2), ["day"], "k")
    with pytest.raises(ValueError, match="keyless"):
        cms_inner_product(keyed, cms_state(b, [], "k"))


def test_kmv_state_merge_estimate_and_set_algebra(spark):
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.aggstate import (
        kmv_estimate,
        kmv_merge,
        kmv_state,
        kmv_union_intersect,
    )

    # groups: g1 = 0..99, g2 = 50..149 -> |union|=150, |inter|=50, J=1/3
    rows = [("g1", v) for v in range(100)] + [("g2", v) for v in range(50, 150)]
    df = spark.createDataFrame(rows, "g string, v long")

    st = kmv_state(df, ["g"], "v", k=32)
    # duplicates cannot change a min-set sketch
    st_dup = kmv_state(df.union(df), ["g"], "v", k=32)
    assert sorted(map(tuple, st.collect())) == sorted(map(tuple, st_dup.collect()))

    # split-build then merge == direct build (associative/idempotent)
    halves = df.withColumn("h", F.col("v") % 2)
    merged = kmv_merge(kmv_state(halves, ["g", "h"], "v", k=32), ["g"], k=32)
    assert sorted(map(tuple, st.collect())) == sorted(map(tuple, merged.collect()))

    # under-filled sketch is EXACT: only 10 distinct values
    small = kmv_state(df.filter(F.col("v") < 10), ["g"], "v", k=32)
    est_small = {r.g: r.est for r in kmv_estimate(small, ["g"], k=32).collect()}
    assert est_small == {"g1": 10.0}

    # filled sketch: order-statistic estimate within ~4/sqrt(k) of truth
    est = {r.g: r.est for r in kmv_estimate(st, ["g"], k=32).collect()}
    for g in ("g1", "g2"):
        assert abs(est[g] - 100) / 100 < 0.75  # 32-min sketch, loose bound

    # set algebra from the two keyless states
    sa = st.filter(F.col("g") == "g1").select("r", "u")
    sb = st.filter(F.col("g") == "g2").select("r", "u")
    [row] = kmv_union_intersect(sa, sb, k=32).collect()
    assert row.n_union_state == 32
    assert abs(row.union_est - 150) / 150 < 0.75
    assert 0.0 <= row.jaccard <= 1.0
    assert abs(row.intersect_est - row.jaccard * row.union_est) < 0.02

    import pytest

    with pytest.raises(ValueError):
        kmv_state(df, ["g"], "v", k=1)


def test_kmv_estimate_rejects_state_built_with_larger_k(spark):
    """kmv_estimate's k is coupled to the k the state was built with: a
    state holding ranks beyond k (built with a larger k) would be misread
    as overfull and must raise instead of silently corrupting the
    estimate."""
    import pytest
    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.aggstate import kmv_estimate, kmv_state

    df = spark.range(200).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("v")
    )
    st = kmv_state(df, ["g"], "v", k=64)
    with pytest.raises(Exception, match="kmv_estimate"):
        kmv_estimate(st, ["g"], k=32).collect()
    # matching k still estimates
    [row] = kmv_estimate(st, ["g"], k=64).collect()
    assert row.n_state == 64 and row.est > 0
