"""Tests for the query-registry rotation logic (suite._coverage_priority):
the driver checks a capped window of queries() per round, so ordering
mistakes silently remove queries from the correctness gate."""

from __future__ import annotations

import json

from arrowhouse_spark import suite


def _write(path, data):
    with open(path, "w") as f:
        json.dump(data, f)


def test_coverage_priority_regression_outranks_never_checked(tmp_path):
    """A query green in r01 but FAILED in r02 must classify as group 0 —
    AHEAD of never-checked queries (a known regression is strictly worse
    than an unknown; round-8 verdict item 2) — not ride its stale r01
    proof into the oldest-green rotation."""
    names = list(suite._QUERIES)[:3]
    a, b, c = names
    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 1, "oracle_rows": 1, "err": None}
    bad = dict(ok, hash_match=False)
    _write(tmp_path / "CORRECTNESS_r01.json", {a: ok, b: ok})
    _write(tmp_path / "CORRECTNESS_r02.json", {a: bad, b: ok})

    prio = suite._coverage_priority(artifact_dir=str(tmp_path))
    assert prio[a][0] == 0, "driver-failed query must come FIRST"
    assert prio[b][0] == 2, "still-green query rotates by oldest proof"
    assert prio[c][0] == 1, "never-checked query comes after failed ones"
    # failed < never-checked < green in the final sort
    assert prio[a] < prio[c] < prio[b]


def test_coverage_priority_rows_only_with_new_oracle_front(tmp_path):
    """A query only ever checked rows-only (err=no_oracle) that NOW has an
    oracle must be treated as never-value-checked (group 1, with the
    never-checked — it has no failure on record)."""
    oracled = [n for n in suite._QUERIES if n in suite._ORACLES]
    a = oracled[0]
    _write(
        tmp_path / "CORRECTNESS_r01.json",
        {a: {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"}},
    )
    prio = suite._coverage_priority(artifact_dir=str(tmp_path))
    assert prio[a][0] == 1


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


def test_spark_entry_driver_contract(spark):
    """__spark_entry__ is the DRIVER's surface: entry() must run (the
    round-9 suite split silently broke its module-attribute lookup while
    every registry test stayed green — this is the guard), and
    queries()/oracle_sql() must stay same-keyed."""
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 239


def test_readme_query_counts_match_registry():
    """Every hand-written registry count in README.md must equal the live
    registry size — the round-9 verdict flagged silent drift, so the
    counts are now pinned here instead of trusted."""
    import re

    import __spark_entry__ as e

    n = len(e.queries())
    text = open("README.md").read()
    for m in re.finditer(r"(\d+) registered queries|Registry: (\d+) queries", text):
        claimed = int(m.group(1) or m.group(2))
        assert claimed == n, (
            f"README claims {claimed} queries; registry has {n} — "
            "update the README paragraph"
        )
