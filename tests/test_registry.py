"""Tests for the query-registry rotation logic (suite._coverage_priority):
the driver checks a capped window of queries() per round, so ordering
mistakes silently remove queries from the correctness gate."""

from __future__ import annotations

import json

from arrowhouse_spark import suite


def _write(path, data):
    with open(path, "w") as f:
        json.dump(data, f)


def test_coverage_priority_regression_reenters_window(tmp_path, monkeypatch):
    """A query green in r01 but FAILED in r02 must classify as group 1
    (checked-not-green → re-check immediately), not ride its stale r01
    proof into the oldest-green rotation."""
    import glob as glob_mod

    names = list(suite._QUERIES)[:3]
    a, b, c = names
    f1 = tmp_path / "CORRECTNESS_r01.json"
    f2 = tmp_path / "CORRECTNESS_r02.json"
    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 1, "oracle_rows": 1, "err": None}
    bad = dict(ok, hash_match=False)
    _write(f1, {a: ok, b: ok})
    _write(f2, {a: bad, b: ok})

    real_glob = glob_mod.glob

    def fake_glob(pat):
        if "CORRECTNESS_r" in pat:
            return [str(f1), str(f2)]
        return real_glob(pat)

    monkeypatch.setattr(glob_mod, "glob", fake_glob)
    prio = suite._coverage_priority()
    assert prio[a][0] == 1, "regressed query must re-enter the checked window"
    assert prio[b][0] == 2, "still-green query rotates by oldest proof"
    assert prio[c][0] == 0, "never-checked query goes to the front"
    # and the regressed query sorts ahead of every green one
    assert prio[a] < prio[b]


def test_coverage_priority_rows_only_with_new_oracle_front(tmp_path, monkeypatch):
    """A query only ever checked rows-only (err=no_oracle) that NOW has an
    oracle must be treated as never-value-checked (group 0)."""
    import glob as glob_mod

    oracled = [n for n in suite._QUERIES if n in suite._ORACLES]
    a = oracled[0]
    f1 = tmp_path / "CORRECTNESS_r01.json"
    _write(
        f1,
        {a: {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"}},
    )
    real_glob = glob_mod.glob

    def fake_glob(pat):
        if "CORRECTNESS_r" in pat:
            return [str(f1)]
        return real_glob(pat)

    monkeypatch.setattr(glob_mod, "glob", fake_glob)
    prio = suite._coverage_priority()
    assert prio[a][0] == 0


def test_queries_order_respects_priority():
    """queries() must enumerate in priority order (the driver truncates)."""
    order = list(suite.queries())
    prio = suite._coverage_priority()
    keys = [prio[n] for n in order]
    assert keys == sorted(keys)


def test_suite_rel_cache_capped(spark):
    """Round-6 verdict #6: the suite-level relation cache enforces the
    same hard cap + FIFO eviction + release discipline as the operator
    registry in operators/dedup.py."""
    from arrowhouse_spark import suite

    suite.release_rel_caches()
    orig = suite._REL_CACHE_MAX
    suite._REL_CACHE_MAX = 3
    try:
        for k in range(5):
            suite._rel_cached(
                ("app", "dir", f"t{k}"),
                lambda k=k: spark.range(k + 1).toDF("v"),
            )
        assert len(suite._REL_CACHE) == 3
        tags = [key[2] for key in suite._REL_CACHE]
        assert tags == ["t2", "t3", "t4"]  # oldest two evicted FIFO
        # hit returns the cached object without eviction
        a = suite._rel_cached(("app", "dir", "t4"), lambda: None)
        assert a is suite._REL_CACHE[("app", "dir", "t4")]
        assert suite.release_rel_caches() == 3
        assert len(suite._REL_CACHE) == 0
    finally:
        suite._REL_CACHE_MAX = orig
        suite.release_rel_caches()
