"""Text-analysis operators for training-data pipelines (BASELINE.json north
star: language-ID, quality scoring, token counting, fingerprinting).

Not present in the reference (its surface stops at scalar kernels +
aggregation); these are the capability extensions the project brief requires,
built exclusively from JVM-side ``pyspark.sql.functions`` so they stay inside
whole-stage codegen and scale linearly with input — no Python in the hot path.

Every function is deterministic and (except the rolling hash) expressible in
ANSI SQL, so each has a DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language marker-word sets for the n-gram/stopword heuristic.
# Real pipelines plug in fastText/CLD3 via mapInPandas (see operators.multimodal
# for the pattern); the heuristic keeps language-ID fully JVM-side.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization with empty-token removal (BPE-ish regex split
    would be ``F.split(c, r\"\\s+|(?=[.,!?;])\")`` — whitespace keeps the
    DuckDB oracle exact)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, " "), lambda x: x != "")


def token_count(df: DataFrame, text_col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(text_col)))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/uniqueness/word-shape quality features + a composite score.

    Columns added: n_chars_q, n_tokens, n_uniq_tokens, uniq_ratio,
    mean_token_len, quality (0..1). All pure SQL expressions.
    """
    toks = tokens(text_col)
    df = (
        df.withColumn("n_chars_q", F.length(F.col(text_col)))
        .withColumn("n_tokens", F.size(toks))
        .withColumn("n_uniq_tokens", F.size(F.array_distinct(toks)))
    )
    df = df.withColumn(
        "uniq_ratio",
        F.round(F.col("n_uniq_tokens") / F.greatest(F.col("n_tokens"), F.lit(1)), 6),
    ).withColumn(
        "mean_token_len",
        F.round(
            (F.col("n_chars_q") - (F.col("n_tokens") - 1))
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            6,
        ),
    )
    # composite: favor mid-length docs with diverse tokens
    return df.withColumn(
        "quality",
        F.round(
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * F.col("uniq_ratio"),
            6,
        ),
    )


def lang_id(df: DataFrame, text_col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Marker-word language ID: score = |tokens ∩ markers(lang)| per language,
    argmax with deterministic lexicographic tie-break ('unknown' if all 0)."""
    toks = F.array_distinct(tokens(text_col))
    scores = [
        F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias(
            f"score_{lang}"
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    df = df.select("*", *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best == 0, F.lit("unknown"))
    for l in langs:  # first (lexicographic) max wins — deterministic
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return df.withColumn(out, pred)


def fingerprint(df: DataFrame, text_col: str = "text", out: str = "fp") -> DataFrame:
    """Content fingerprint: md5 of the normalized text (lower, collapse
    whitespace). Cross-engine reproducible (DuckDB md5) — the exact-dedup key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out, F.md5(norm.cast("binary")))


def rolling_hash(df: DataFrame, text_col: str = "text", out: str = "rhash") -> DataFrame:
    """Polynomial rolling hash over characters (base 31, mod 1e9+7) via
    F.aggregate over the char array — fully JVM-side fold, used as a
    cheap order-sensitive document signature. Modulus keeps the accumulator
    < 2^35 so ANSI-mode overflow checking never trips."""
    chars = F.split(F.col(text_col), "")
    return df.withColumn(
        out,
        F.aggregate(
            chars,
            F.lit(0).cast("long"),
            lambda acc, c: (acc * F.lit(31) + F.ascii(c)) % F.lit(1_000_000_007),
        ),
    )


def inverted_index_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_freq, total_tf) — the posting-list statistics of an
    inverted index. Two keyed aggregations: (term, doc) for tf, then term.
    Repartition precedes the explode so tokenization runs at cluster
    parallelism, and the (term, doc) grouping pre-shards hot terms before
    the per-term rollup (same two-phase shape as a salted count-distinct)."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    tok = (
        df.repartition(n_part, id_col)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    )
    tf = tok.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by tf·idf (idf = ln(N/df)), deterministic
    tie-break (score desc, term asc). N arrives via a broadcast 1-row
    aggregate, not a driver-side count — the whole computation is one plan."""
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    tok = (
        df.repartition(n_part, id_col)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    )
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )
