"""dsir_importance (operators/dsir.py): target-like docs must score above
pool-like docs; degenerate inputs are safe."""

from __future__ import annotations

from pyspark.sql import functions as F

from arrowhouse_spark.operators.dsir import dsir_importance


def test_dsir_separates_target_vocabulary(spark):
    # target docs speak {alpha..delta}; the rest speak {kappa..nu}. Two
    # held-out pool docs — one in each vocabulary — must land on opposite
    # sides of 0.
    rows = []
    for i in range(10):
        rows.append((i, "alpha beta gamma delta alpha beta", "t"))
    for i in range(10, 30):
        rows.append((i, "kappa lam mu nu kappa lam mu nu", "r"))
    rows.append((98, "alpha beta gamma delta", "r"))  # target-like outsider
    rows.append((99, "kappa lam mu nu", "r"))  # pool-like outsider
    docs = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    got = {
        r.doc_id: r.log_importance
        for r in dsir_importance(docs, target=F.col("grp") == "t").collect()
    }
    assert got[98] > 0.0, got[98]
    assert got[99] < 0.0, got[99]
    assert got[98] > got[99] + 0.5
    assert len(got) == 32


def test_dsir_empty_text_scores_zero(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta", "t"), (1, "", "r"), (2, None, "r")],
        "doc_id long, text string, grp string",
    )
    got = {
        r.doc_id: (r.n_toks, r.log_importance)
        for r in dsir_importance(docs, target=F.col("grp") == "t").collect()
    }
    assert got[1] == (0, 0.0) and got[2] == (0, 0.0)
    assert got[0][0] == 2


def test_dsir_null_target_rows_count_as_nontarget(spark):
    """A NULL predicate row (lang IS NULL under lang=='en') must behave
    exactly like a non-target row. Without the coalesce, a bucket whose
    tokens ALL come from NULL-target docs gets c_t = sum(all NULL) = NULL,
    its log-ratio goes NULL, and the per-doc sum silently skips it —
    inflating scores for every doc sharing those buckets."""
    rows = [
        (0, "alpha beta alpha", "en"),
        (1, "gamma delta", "en"),
        # tokens unique to the NULL-lang doc -> their buckets would be
        # all-NULL without the fix
        (2, "zzz qqq zzz www", None),
        (3, "alpha zzz", "en"),
    ]
    null_docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    filled = spark.createDataFrame(
        [(d, t, l if l is not None else "xx") for d, t, l in rows],
        "doc_id long, text string, lang string",
    )
    tgt = F.col("lang") == "en"
    got_null = sorted(
        tuple(r) for r in dsir_importance(null_docs, target=tgt).collect()
    )
    got_filled = sorted(
        tuple(r) for r in dsir_importance(filled, target=tgt).collect()
    )
    assert got_null == got_filled
