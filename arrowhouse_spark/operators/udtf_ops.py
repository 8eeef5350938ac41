"""Python UDTF surface (Spark 4.x) + the declarative twin.

Spark 4 adds Python user-defined TABLE functions — one input row fans
out to N output rows with a fixed schema, consumable via LATERAL join
(``SELECT d.*, t.* FROM docs d, LATERAL token_runs(d.doc_id, d.text) t``).
This module exercises that surface the same way sources/pyds.py
exercises the Python DataSource API: a real, tested implementation of a
capability the engine needs anyway, with the scale doctrine stated
honestly.

The capability: MAXIMAL REPEATED-TOKEN RUNS — for each document, every
maximal span of >= min_run consecutive identical tokens, as
(start_pos, token, run_len) rows. Adjacent-token repetition is a core
repetition-quality signal (the Gopher/C4 family measures duplicate
n-gram FRACTIONS; the run table is the positional form that supports
span-level repair, like dedup.py's ExactSubstr span removal).

Scale doctrine: the UDTF is row-at-a-time Python — the API-surface
demo, correct but the slow path. The hot path is
:func:`token_runs_declarative`: posexplode + per-doc lag boundary
detection + one island aggregate, all JVM-side (windows partitioned by
doc_id — never unpartitioned). tests/test_udtf.py pins the two
IDENTICAL on the documents fixture, so the fast form carries the
semantics and the UDTF carries the API parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MIN_RUN_DEFAULT = 2


class TokenRunsUDTF:
    """UDTF: (doc_id, text) -> rows of maximal runs >= MIN_RUN_DEFAULT.

    Register with ``spark.udtf.register("token_runs", token_runs_udtf)``
    where ``token_runs_udtf`` is this class wrapped by
    :func:`make_token_runs_udtf`. Tokenization matches
    operators/text.py:tokens (whitespace split of lowercased text), so
    positions line up with every other token-indexed operator.
    """

    def eval(self, doc_id, text):  # noqa: ANN001 — UDTF signature
        if text is None:
            return
        # mirror operators/text.py:tokens exactly: split on single
        # spaces, drop empties, positions indexed in the FILTERED list
        toks = [t for t in text.lower().split(" ") if t != ""]
        i, n = 0, len(toks)
        while i < n:
            j = i + 1
            while j < n and toks[j] == toks[i]:
                j += 1
            if j - i >= MIN_RUN_DEFAULT:
                yield int(doc_id), int(i), toks[i], int(j - i)
            i = j


def make_token_runs_udtf():
    """Build the decorated UDTF lazily (the ``udtf`` decorator imports
    pyspark internals; keep module import cheap)."""
    from pyspark.sql.functions import udtf

    return udtf(
        TokenRunsUDTF,
        returnType="doc_id bigint, start_pos int, token string, run_len int",
    )


def token_runs_udtf_table(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Run the UDTF over ``df`` via LATERAL join — the Spark-4 API-surface
    path. Row-at-a-time Python: demo/parity form, not the 100 TB plan."""
    spark = df.sparkSession
    spark.udtf.register("__token_runs", make_token_runs_udtf())
    view = f"__udtf_docs_{abs(id(df)) % 10**10}"
    df.select(F.col(id_col), F.col(text_col)).createOrReplaceTempView(view)
    return spark.sql(
        f"""
        SELECT t.doc_id, t.start_pos, t.token, t.run_len
        FROM {view} d, LATERAL __token_runs(d.{id_col}, d.{text_col}) t
        """
    )


def token_runs_declarative(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_run: int = MIN_RUN_DEFAULT,
) -> DataFrame:
    """Maximal repeated-token runs, fully declarative (the hot path).

    Plan: posexplode tokens -> per-doc window ordered by position
    flags run BOUNDARIES (token != lag(token)) -> running sum of flags
    names each island -> one keyed aggregate per (doc, island) emits
    (min pos, token, count). Two per-doc-partitioned windows plus one
    keyed aggregate; shuffle keys are (doc_id), so reducer state is one
    document's token list — the same bound as every text operator here.
    """
    from arrowhouse_spark.operators.text import tokens

    # positions index the FILTERED token list (text.py:tokens drops
    # empties inside the array, BEFORE posexplode) — identical to the
    # UDTF's filtered-list indexing
    pos = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "token"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = pos.withColumn(
        "boundary",
        F.when(
            F.lag("token").over(w).isNull()
            | (F.lag("token").over(w) != F.col("token")),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island", F.sum("boundary").over(w)
    )
    return (
        islands.groupBy(id_col, "island")
        .agg(
            F.min("pos").cast("int").alias("start_pos"),
            F.first("token").alias("token"),
            F.count(F.lit(1)).cast("int").alias("run_len"),
        )
        .filter(F.col("run_len") >= min_run)
        .select(id_col, "start_pos", "token", "run_len")
    )
