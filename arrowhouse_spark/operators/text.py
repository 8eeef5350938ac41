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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from arrowhouse_spark.session import shuffle_parts

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
    n_part = shuffle_parts(df.sparkSession)
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
    n_part = shuffle_parts(df.sparkSession)
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


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Gopher/C4-style repetition + shape quality signals per document
    (Rae et al. 2021 §A1.1; Raffel et al. 2020 §2.2) — the filter battery a
    training-data pipeline runs before dedup. Superset of the reference
    (whose surface stops at scalar kernels).

    Signals:
      n_words, mean_word_len           — length shape
      alpha_word_ratio                 — fraction of words containing [a-z]
      symbol_ratio                     — non-alphanumeric-non-space chars/chars
      top_bigram_frac                  — occurrences of the most frequent
                                         bigram / total bigrams (repetition)
      dup_word_frac                    — 1 - distinct words / words
      gopher_pass                      — the conjunctive keep decision

    Plan shape: both branches grow from ONE repartition(id) of a projection
    that materializes the token array once — identical subplans, so Spark's
    ReuseExchange scans and shuffles the text a single time; the scalar
    signals then read the materialized array (tokenization is the dominant
    per-row cost and would otherwise re-run per signal). top_bigram_frac
    needs one explode + one (id, bigram) count + one per-id max/sum rollup —
    the count pre-shards hot bigrams. The id-partitioned branches also meet
    the final join without further shuffles.

    ``tokens_col`` — name of an already-tokenized array<string> column on
    ``df`` (the ``tokens()`` expression precomputed, e.g. a pipeline-shared
    persisted relation); when given, the split is skipped so composed
    pipelines tokenize the corpus once instead of once per stage, AND the
    internal repartition is skipped — the caller's (typically persisted,
    id-partitioned) layout is trusted, since re-shuffling an
    already-materialized token relation by the same key would only move
    the text twice. ``df`` must still carry ``text_col`` for the
    char-level signals."""
    from arrowhouse_spark.operators.dedup import ngrams_from_tokens

    tok_expr = F.col(tokens_col) if tokens_col else tokens(text_col)
    n_part = shuffle_parts(df.sparkSession)
    spread = df if tokens_col else df.repartition(n_part, id_col)
    base = spread.select(
        F.col(id_col),
        F.length(text_col).alias("__len"),
        tok_expr.alias("__w"),
        F.length(F.regexp_replace(F.col(text_col), r"[A-Za-z0-9 ]", "")).alias(
            "__n_sym"
        ),
    )
    toks = F.col("__w")
    n_words = F.size(toks)
    scalar = base.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(
            (F.col("__len") - (n_words - F.lit(1))) / F.greatest(n_words, F.lit(1)),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
            / F.greatest(n_words, F.lit(1)),
            6,
        ).alias("alpha_word_ratio"),
        F.round(
            F.col("__n_sym") / F.greatest(F.col("__len"), F.lit(1)), 6
        ).alias("symbol_ratio"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(n_words, F.lit(1)),
            6,
        ).alias("dup_word_frac"),
    )
    # In tokens_col mode the caller's relation is typically a
    # localCheckpoint leaf whose partitioning metadata is LOST, so the
    # (id, bigram) count exchange below is AQE-coalesced to ONE partition
    # on small inputs — the per-doc rollup then runs a ~2 s single task at
    # sf0.1 (measured; guide §2.5). An explicit id-keyed repartition
    # BEFORE the explode pins the width AND satisfies both groupBys'
    # clustering (id ⊆ {id,bg}), so the exploded bigrams never shuffle at
    # all. The non-tokens path already repartitions by id above.
    bg_base = base.repartition(n_part, id_col) if tokens_col else base
    bigram_counts = (
        bg_base.select(
            F.col(id_col),
            F.explode(ngrams_from_tokens(toks, 2)).alias("bg"),
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.round(F.max("c") / F.sum("c"), 6).alias("top_bigram_frac"),
        )
    )
    out = scalar.join(bigram_counts, id_col, "left").withColumn(
        "top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0))
    )
    # Gopher-flavored keep rule (thresholds from Rae et al. Table A1, adapted
    # to word-level bigrams): 50 ≤ words ≤ 100k, 3 ≤ mean len ≤ 10,
    # ≥80% alphabetic words, ≤10% symbols, top bigram ≤ 18% of bigrams.
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len") >= 3)
        & (F.col("mean_word_len") <= 10)
        & (F.col("alpha_word_ratio") >= 0.8)
        & (F.col("symbol_ratio") <= 0.1)
        & (F.col("top_bigram_frac") <= 0.18),
    )


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any ``ngram_n``-gram
    with an evaluation set (the GPT-3/PaLM 13-gram rule; Brown et al. 2020
    §C). Returns (id, n_contaminated_grams, is_contaminated).

    100 TB plan shape: eval sets are small (thousands of docs), so their
    distinct gram hashes build ONE broadcast relation; the corpus side
    streams its grams map-side against the broadcast hash — no shuffle of
    corpus text, no shuffle of corpus grams, just the per-doc count rollup
    keyed by id (which the pre-explode repartition already co-locates)."""
    from arrowhouse_spark.operators.dedup import shingle_relation

    corpus_grams = shingle_relation(corpus, text_col, id_col, ngram_n)
    eval_grams = (
        shingle_relation(eval_df, text_col, id_col, ngram_n)
        .select("shingle")
        .distinct()
    )
    hits = (
        corpus_grams.join(F.broadcast(eval_grams), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )
    ids = corpus.select(id_col)
    return (
        ids.join(hits, id_col, "left")
        .withColumn(
            "n_contaminated_grams", F.coalesce("n_contaminated_grams", F.lit(0))
        )
        .withColumn(
            "is_contaminated", F.col("n_contaminated_grams") >= F.lit(min_hits)
        )
    )


#: BPE-ish pre-tokenization classes: letter runs, digit runs, single other
#: non-space symbols — the GPT-2-style split shape, minus byte fallback.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(
    df: DataFrame, text_col: str = "text", out: str = "n_bpe_tokens"
) -> DataFrame:
    """Token count under a BPE-ish pre-tokenizer regex (letter runs, digit
    runs, isolated symbols). Stays JVM-side via regexp_extract_all — the
    whitespace counter underestimates code/punctuation-heavy text, which is
    exactly the text a quality filter needs to see."""
    return df.withColumn(
        out, F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0)))
    )


def unigram_logprob_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Self-corpus unigram log-probability score — the order-0 case of the
    CCNet/Wikipedia-LM perplexity filter used to rank web text: documents
    full of corpus-typical tokens score low, rare-token-heavy documents
    (OCR noise, gibberish, boilerplate soup) score high.

    Returns (id_col, n_tokens_lm, mean_neg_logprob) with
    mean_neg_logprob = avg over token INSTANCES of −ln(tf(token)/total).

    Scale: one explode feeds BOTH the frequency table (groupBy token, map-
    side partial) and the scoring join (shuffle keyed on the token — never
    broadcast-assumed, vocab can be huge); the corpus total arrives as a
    1-row broadcast, never a driver collect. Real pipelines swap the
    self-corpus table for a reference-LM table — same join shape.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = tf.agg(F.sum("tf").alias("total"))
    scored = toks.join(tf, "tok").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens_lm"),
        F.round(
            F.avg(-F.log(F.col("tf") / F.col("total"))), 3
        ).alias("mean_neg_logprob"),
    )


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> DataFrame:
    """Self-corpus interpolated bigram log-probability — one order up from
    :func:`unigram_logprob_score`, the distributed stand-in for the CCNet
    KenLM perplexity filter (Wenzek et al. 2020 §3.3; their 5-gram model is
    a single-machine artifact — the JOIN SHAPE here is what carries to any
    order, each order adding one more gram-keyed frequency table).

    Per token instance at position i ≥ 1:
      p = lam·p_bi(tokᵢ|tokᵢ₋₁) + (1−lam)·p_uni(tokᵢ)
    with p_bi = tf(prev,tok)/tf(prev) and p_uni = tf(tok)/total — counts
    from the corpus itself, so the score is a well-defined mixture even for
    bigrams never seen (the unigram floor keeps p > 0; 1-token documents
    have no scored positions and drop out, matching the n≥2 contract).

    Returns (id_col, n_bigrams_lm, mean_neg_logprob2) with the mean of
    −ln p over scored positions, rounded to 3 dp.

    Scale: bigrams come from one array transform (no per-doc window/lag
    shuffle); tokens hash to 8 bytes INSIDE that transform, so every
    frequency table and join downstream is keyed on longs, never strings —
    measured 8.1 s → 1.2 s at sf0.1 (6.6×), the line_dedup hash-key
    discipline (a 64-bit collision would merge two token classes; the
    suite oracle stays string-keyed, so a collision surfaces as a
    mismatch). The three joins are gram-keyed shuffles — unigram tf joined
    twice (once on prev for the denominator, once on tok for the floor)
    and bigram tf once — never broadcast-assumed since web vocab and
    bigram tables are huge; the corpus total is a 1-row broadcast.
    Swapping the self-corpus tables for reference-LM tables is the
    production configuration, same plan."""
    hashed = F.transform(tokens(text_col), lambda x: F.xxhash64(x))
    base = df.select(F.col(id_col), hashed.alias("__ht"))
    ht = F.col("__ht")
    grams = base.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(ht) < 2, F.array().cast("array<struct<prev:bigint,tok:bigint>>")
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size(ht) - 1),
                    lambda i: F.struct(
                        F.element_at(ht, i).alias("prev"),
                        F.element_at(ht, i + 1).alias("tok"),
                    ),
                )
            )
        ).alias("g"),
    ).select(F.col(id_col), F.col("g.prev").alias("prev"), F.col("g.tok").alias("tok"))
    utoks = base.select(F.explode(ht).alias("tok"))
    uni = utoks.groupBy("tok").agg(F.count(F.lit(1)).alias("utf"))
    total = uni.agg(F.sum("utf").alias("total"))
    bi = grams.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("btf"))
    scored = (
        grams.join(bi, ["prev", "tok"])
        .join(uni.select(F.col("tok").alias("prev"), F.col("utf").alias("ptf")), "prev")
        .join(uni, "tok")
        .crossJoin(F.broadcast(total))
    )
    p = F.lit(lam) * (F.col("btf") / F.col("ptf")) + F.lit(1.0 - lam) * (
        F.col("utf") / F.col("total")
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams_lm"),
        F.round(F.avg(-F.log(p)), 3).alias("mean_neg_logprob2"),
    )


# Upper bound on vocab_encode's driver-side rank table: 2^20 (tok, tf) rows
# is a few tens of MB — comfortably driver-bounded, and far past any vocab a
# token-id encoding realistically uses (GPT-2 50k, modern BPE ≤ 256k).
_VOCAB_RANK_MAX = 1 << 20

# Below this, rank assignment stays a LAZY broadcast theta-join (≤ 4096² =
# 16.7M comparisons of a constant-sized set — microseconds of JVM work, and
# the whole operator remains one deferred DAG, which matters when the input
# is an expensive composed pipeline: an eager driver-side rank would execute
# that upstream pipeline once per call just to build the vocab). Above it,
# the join's V² cost cliffs (50k vocab = 2.5e9 comparisons) and the
# driver-side O(V log V) sort over the collected top-V wins despite the
# eager upstream execution.
_VOCAB_RANK_JOIN_MAX = 4096


def vocab_encode(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    unk_id: int = 0,
    tokens_col: str | None = None,
    with_ids: bool = True,
) -> DataFrame:
    """Corpus-derived vocabulary encoding — the tokenize-to-ids step a
    training pipeline runs between text cleaning and sequence packing.
    Builds the top-``vocab_size`` vocabulary by (count desc, token asc),
    assigns ids 1..V in that rank order (``unk_id`` for everything else),
    and encodes each document as its id sequence in token order.

    Returns (id_col, n_tokens, n_unk, ids array<int>) — feed ``ids`` /
    ``n_tokens`` straight into operators/packing.py:pack_sequences.

    Scale: the vocab build is one token groupBy + a global top-V
    (TakeOrdered). Rank assignment is dual-path (round-5 advice: the
    original always-join form had a V² cliff at caller-controlled vocab
    sizes): for V ≤ _VOCAB_RANK_JOIN_MAX it stays a LAZY broadcast
    theta-join over the V-row relation (bounded ≤16.7M comparisons, whole
    operator one deferred DAG — deliberately NOT a row_number window,
    whose empty partition spec is the single-task shape the plan audit
    forbids); for larger V the top-V rows are collected and ranked
    driver-side in O(V log V) — bounded by construction (``vocab_size``
    rows, guarded at ``_VOCAB_RANK_MAX``), the same bounded-collect
    pattern as the k-means/IVF centroid init, at the cost of executing
    the upstream plan eagerly once. The encode join is token-keyed
    (vocab is NOT broadcast-assumed — at V ≤ ~1e6 Spark's AQE will
    broadcast it anyway); reassembly is one shuffle by doc id with
    array_sort over (pos, id) structs — the line_dedup_lines reassembly
    shape, no unpartitioned window. ``tokens_col`` names an
    already-tokenized array column on ``df`` (skips the split — the
    pipeline scan-sharing seam). ``with_ids=False`` replaces the ``ids``
    array with the position-weighted ``ids_checksum`` Σ(pos+1)·id computed
    INSIDE the hash aggregate — no collect_list / per-doc array sort /
    array materialization for consumers that only audit the sequence."""
    if 1 <= unk_id <= vocab_size:
        raise ValueError(
            f"unk_id={unk_id} collides with the assigned id range "
            f"1..{vocab_size}; OOV would be indistinguishable from a vocab token"
        )
    if vocab_size > _VOCAB_RANK_MAX:
        raise ValueError(
            f"vocab_size={vocab_size} exceeds the supported bound "
            f"{_VOCAB_RANK_MAX}: the rank table is built driver-side from "
            "the top-V rows (which the TakeOrdered plan gathers to the "
            "driver regardless), so V must stay driver-memory-bounded"
        )
    tok_expr = F.col(tokens_col) if tokens_col else tokens(text_col)
    toks = df.select(
        F.col(id_col), F.posexplode(tok_expr).alias("pos", "tok")
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("tok").asc())
        .limit(vocab_size)
    )
    # tid = rank in (tf desc, tok asc) order; (tf, tok) is unique per entry
    # so the rank is total and deterministic
    if vocab_size <= _VOCAB_RANK_JOIN_MAX:
        # lazy path: 1 + number of strictly-higher-ranked vocab entries via
        # a broadcast theta-join over the constant-sized top-V relation.
        # `top` is referenced twice (rank base + broadcast side) — without
        # a cut the corpus-sized token-count + TakeOrdered subtree executes
        # twice
        top = top.localCheckpoint(eager=False)
        other = F.broadcast(
            top.select(F.col("tok").alias("tok2"), F.col("tf").alias("tf2"))
        )
        higher = (F.col("tf2") > F.col("tf")) | (
            (F.col("tf2") == F.col("tf")) & (F.col("tok2") < F.col("tok"))
        )
        vocab = (
            top.join(other, higher, "left")
            .groupBy("tok")
            .agg((F.count(F.col("tok2")) + 1).cast("int").alias("tid"))
        )
    else:
        # eager path: sorted driver-side — collect() after limit() does
        # preserve the TakeOrdered order, but re-sorting V rows is free and
        # removes the dependency on that plan detail
        ranked = sorted(top.collect(), key=lambda r: (-r["tf"], r["tok"]))
        from arrowhouse_spark.sources.memory import one_block

        vocab = one_block(
            df.sparkSession,
            [(r["tok"], i + 1) for i, r in enumerate(ranked)],
            "tok string, tid int",
        )
    enc = toks.join(vocab, "tok", "left").select(
        F.col(id_col),
        "pos",
        F.coalesce(F.col("tid"), F.lit(unk_id).cast("int")).alias("tid"),
    )
    base_aggs = [
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("tid") == unk_id, 1).otherwise(0))
        .cast("int")
        .alias("n_unk"),
    ]
    if with_ids:
        return enc.groupBy(id_col).agg(
            *base_aggs,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tid"))),
                lambda s: s["tid"],
            ).alias("ids"),
        )
    # checksum-only path: Σ(pos+1)·tid is order-independent, so it folds
    # straight into the hash aggregate — no collect_list, no per-doc array
    # sort, no array materialization. Consumers that only pin/audit the
    # sequence (the oracle suite, the composed pipelines) should use this.
    return enc.groupBy(id_col).agg(
        *base_aggs,
        F.sum((F.col("pos") + 1).cast("long") * F.col("tid").cast("long"))
        .cast("long")
        .alias("ids_checksum"),
    )


def source_kl_divergence(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-source token-distribution divergence KL(p_source ‖ p_corpus) —
    the mixing diagnostic a pipeline reads before setting source weights
    (a source with near-zero KL adds little diversity; an extreme one needs
    quality review). KL is well-defined without smoothing because every
    source token is corpus-supported (q(t) > 0 wherever p(t) > 0).

    Returns (group_col, n_tokens, kl_nats) with KL = Σ_t p ln(p/q),
    rounded to 3 dp.

    Scale: one (source, token)-keyed count feeds both the per-source total
    (source-keyed rollup) and the divergence sum; the corpus marginal is a
    token-keyed join off the same relation; totals are tiny broadcast
    rollups. Text shuffles once as (source, token, count)."""
    st = (
        df.select(F.col(group_col).alias("src"), F.explode(tokens(text_col)).alias("tok"))
        .groupBy("src", "tok")
        .agg(F.count(F.lit(1)).alias("stf"))
    )
    corpus = st.groupBy("tok").agg(F.sum("stf").alias("ctf"))
    s_tot = st.groupBy("src").agg(F.sum("stf").alias("s_n"))
    c_tot = corpus.agg(F.sum("ctf").alias("c_n"))
    joined = (
        st.join(corpus, "tok")
        .join(s_tot, "src")
        .crossJoin(F.broadcast(c_tot))
    )
    p = F.col("stf") / F.col("s_n")
    q = F.col("ctf") / F.col("c_n")
    return joined.groupBy(F.col("src").alias(group_col)).agg(
        F.max("s_n").alias("n_tokens"),
        F.round(F.sum(p * F.log(p / q)), 3).alias("kl_nats"),
    )


def encoding_quality(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_non_ascii_ratio: float = 0.25,
) -> DataFrame:
    """Encoding-noise QC — the filter that catches mojibake and binary
    spill before tokenization ever runs (wrong-charset decodes litter text
    with U+FFFD; PDF/binary extraction leaks control bytes). Signals per
    doc: n_replacement (U+FFFD tombstones), ctrl_ratio (C0 controls except
    tab/newline/CR, plus DEL), non_ascii_ratio, and the conjunctive
    encoding_clean (no tombstones, no controls, non-ASCII under
    ``max_non_ascii_ratio`` — non-ASCII alone is NOT noise, it's most of
    the world's languages; only an extreme ratio combined with the other
    signals indicates decode failure).

    All four signals are strip-and-length-diff over codepoint-counting
    regexes chosen to behave identically under Java regex (Spark) and RE2
    (DuckDB) — same discipline as PII_PATTERNS. Pure map-side codegen: no
    shuffle, no UDF."""
    n = F.length(F.col(text_col))
    repl = n - F.length(F.regexp_replace(F.col(text_col), "�", ""))
    ctrl = n - F.length(
        F.regexp_replace(
            F.col(text_col), "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""
        )
    )
    nonascii = n - F.length(
        F.regexp_replace(F.col(text_col), "[^\\x00-\\x7f]", "")
    )
    na_ratio = F.round(nonascii / F.greatest(n, F.lit(1)), 6)
    return df.select(
        F.col(id_col),
        repl.cast("int").alias("n_replacement"),
        F.round(ctrl / F.greatest(n, F.lit(1)), 6).alias("ctrl_ratio"),
        na_ratio.alias("non_ascii_ratio"),
        (
            (repl == 0)
            & (ctrl == 0)
            & (na_ratio <= F.lit(max_non_ascii_ratio))
        ).alias("encoding_clean"),
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): no backreferences, no lookaround, ASCII classes only.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # international-ish phone: +CC (area) number with -/./space separators;
    # anchored on \b so bare long digit runs (ids, years) don't match
    "phone": r"\+\d{1,3}[-. ]\(?\d{2,4}\)?[-. ]\d{3,4}[-. ]?\d{3,4}\b",
}


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
    out: str = "text_clean",
) -> DataFrame:
    """PII redaction — the scrub pass a training-data pipeline runs before
    anything else (C4 keeps only clean lines; RefinedWeb/FineWeb redact
    emails/IPs/phones in place). Superset of the reference (no text surface
    there).

    Each pattern family is replaced by its ``<NAME>`` placeholder and
    counted per document, so the pipeline can audit redaction density or
    drop PII-heavy documents. Returns (id_col, out, n_<name>... , n_pii).

    Scale: a per-row regexp_replace/regexp_count chain — pure JVM codegen,
    NO shuffle, no UDF; at 100 TB this is a map-only pass that fuses into
    whatever scan feeds it. Patterns are written to the RE2-compatible
    subset (no lookaround/backrefs) so the DuckDB oracle runs the very same
    regexes.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    cleaned = F.col(text_col)
    counts = []
    for name, pat in pats.items():
        counts.append(
            F.coalesce(
                F.regexp_count(F.col(text_col), F.lit(pat)), F.lit(0)
            ).alias(f"n_{name}")
        )
        cleaned = F.regexp_replace(cleaned, pat, f"<{name.upper()}>")
    # two-step projection so n_pii SUMS THE ALIASED COLUMNS: each pattern's
    # regexp_count appears exactly once in the plan by construction
    # (round-5 advice — previously the total re-built every count and only
    # Catalyst CSE deduplicated them)
    base = df.select(F.col(id_col), cleaned.alias(out), *counts)
    # start from lit(0) so an explicitly empty patterns dict degrades to
    # n_pii=0 instead of crashing (round-6 advice)
    total: Column = F.lit(0)
    for name in pats:
        total = total + F.col(f"n_{name}")
    return base.withColumn("n_pii", total)


def url_filter(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocked_domains: DataFrame | Sequence[str] = (),
    blocked_keywords: Sequence[str] = (),
) -> DataFrame:
    """URL/domain filtering — the pre-download triage a web-corpus pipeline
    runs before fetching or keeping a page (C4 §2.2 badwords list;
    RefinedWeb §3.1.1 blocklist of 4.6M domains + URL keyword scoring;
    FineWeb's adult/violent URL filter). Superset of the reference (no
    URL surface there).

    Signals per row: ``domain`` (the host extracted from the URL),
    ``blocked_domain`` (exact host match against ``blocked_domains``),
    ``blocked_keyword`` (any of ``blocked_keywords`` is a substring of the
    lowercased URL), and the conjunctive ``url_pass``.

    Scale: the host extraction is one map-side regexp; the domain check is
    an equi-join against the blocklist RELATION — real blocklists are
    millions of rows, which is exactly the broadcast-hash-join shape
    (hinted here; Spark would shuffle-join a blocklist too big to
    broadcast and the semantics hold unchanged). ``blocked_domains`` may
    be a ready DataFrame with a ``domain`` column (the production path —
    read the blocklist table once, reuse across calls) or an inline
    sequence (tests/small lists). Keyword checks compile to a map-side
    boolean chain — bounded by the keyword list length, no join."""
    spark = df.sparkSession
    if isinstance(blocked_domains, DataFrame):
        # lowercase the relation path too — the extracted host is lowered,
        # so mixed-case blocklist rows would never match (round-6 advice)
        bdf = blocked_domains.select(F.lower(F.col("domain")).alias("domain"))
    else:
        from arrowhouse_spark.sources.memory import one_block

        bdf = one_block(
            spark, [(d.lower(),) for d in blocked_domains], "domain string"
        )
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/:?#]+)", 1))
    out = df.withColumn("domain", host)
    hit = (
        bdf.select(F.col("domain"), F.lit(True).alias("__blocked"))
        .distinct()
    )
    out = out.join(F.broadcast(hit), "domain", "left").withColumn(
        "blocked_domain", F.coalesce(F.col("__blocked"), F.lit(False))
    ).drop("__blocked")
    kw = F.lit(False)
    low_url = F.lower(F.col(url_col))
    for k in blocked_keywords:
        kw = kw | low_url.contains(k.lower())
    return out.withColumn("blocked_keyword", kw).withColumn(
        "url_pass", ~F.col("blocked_domain") & ~F.col("blocked_keyword")
    )


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 13,
) -> DataFrame:
    """The REVERSE view of :func:`decontaminate`: per EVALUATION document,
    how compromised is it by the training corpus — the report an eval-suite
    owner reads before trusting a benchmark number (GPT-3 §C publishes
    exactly this table). Returns one row per eval doc:
    (eval_id, n_hit_grams, n_corpus_docs, is_compromised) where
    n_hit_grams counts the eval doc's distinct ``ngram_n``-grams found
    anywhere in the corpus and n_corpus_docs the distinct corpus documents
    containing at least one of them.

    Scale: same plan family as decontaminate with the broadcast flipped —
    the eval gram relation (small) broadcasts, the corpus grams stream
    map-side against it, and the only shuffle is the per-eval-id rollup of
    (eval_id, corpus_id, gram-hash) HIT rows — bounded by actual overlap,
    not corpus size."""
    from arrowhouse_spark.operators.dedup import shingle_relation

    corpus_grams = shingle_relation(corpus, text_col, id_col, ngram_n)
    eval_grams = shingle_relation(eval_df, text_col, id_col, ngram_n).select(
        F.col(id_col).alias("eval_id"), "shingle"
    )
    hits = corpus_grams.join(F.broadcast(eval_grams), "shingle")
    per_eval = hits.groupBy("eval_id").agg(
        F.count_distinct("shingle").alias("n_hit_grams"),
        F.count_distinct(F.col(id_col)).alias("n_corpus_docs"),
    )
    ids = eval_df.select(F.col(id_col).alias("eval_id"))
    return (
        ids.join(per_eval, "eval_id", "left")
        .withColumn("n_hit_grams", F.coalesce("n_hit_grams", F.lit(0)))
        .withColumn("n_corpus_docs", F.coalesce("n_corpus_docs", F.lit(0)))
        .withColumn("is_compromised", F.col("n_hit_grams") >= 1)
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
    out: str = "text_norm",
) -> DataFrame:
    """Unicode normalization (NFC/NFD/NFKC/NFKD) — the canonicalization a
    text pipeline runs before fingerprinting or tokenizing multilingual
    corpora (combining sequences, compatibility ligatures, and fullwidth
    forms otherwise make byte-identical-looking texts hash differently).
    Spark has no built-in normalizer, so this is the documented
    Pandas-UDF seam: an Arrow-batched vectorized UDF over Python's
    ``unicodedata`` (stdlib — no extra dependency), NEVER a row-at-a-time
    Python UDF. Map-side only: no shuffle, fuses into the consuming scan;
    at 100 TB the cost is one Arrow round-trip of the text column, and
    the op composes with the scrub/QC stages in the same batch pass."""
    import pandas as pd  # noqa: PLC0415 — optional at module import
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unsupported normalization form {form!r}")

    def _norm_fn(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    # real type objects, not strings: this module uses
    # `from __future__ import annotations`, which would stringify inline
    # hints into 'pd.Series' that pyspark's get_type_hints cannot resolve
    # (pd is function-local here)
    _norm_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _norm = pandas_udf(_norm_fn, "string")

    return df.withColumn(out, _norm(F.col(text_col)))


def chunk_split(
    df: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Context-window chunking — split each document's token sequence into
    fixed-size training chunks with ``overlap`` tokens of left context
    (stride = chunk_size - overlap), the step every pretraining pipeline
    runs between cleaning and packing so documents longer than the model
    context still contribute whole windows. Output: one row per chunk with
    ``chunk_idx`` (0-based), ``chunk_start`` (token offset), the chunk
    token count, and a 16-hex content signature (md5 of the
    space-rejoined chunk) that pins both the slice boundaries and the
    token content.

    Scale: pure map-side — one ``sequence``/``explode`` per document and a
    ``slice`` per chunk, no shuffle anywhere; output rows ≈ corpus_tokens
    / stride, each carrying the signature rather than the text, so at
    100 TB this fuses into the consuming scan exactly like token_count.
    Pass ``tokens_col`` to reuse a shared tokenization (the
    pipeline-composition seam used by the corpus builds)."""
    if overlap < 0 or overlap >= chunk_size:
        raise ValueError(f"need 0 <= overlap < chunk_size, got {overlap}/{chunk_size}")
    stride = chunk_size - overlap
    toks = F.col(tokens_col) if tokens_col else tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__ct")).filter(
        F.size("__ct") > 0
    )
    starts = F.sequence(
        F.lit(0), F.size("__ct") - 1, F.lit(stride)
    )
    chunk = F.slice("__ct", F.col("chunk_start") + 1, chunk_size)
    return (
        base.select(
            id_col, "__ct", F.explode(starts).alias("chunk_start")
        )
        .select(
            id_col,
            (F.col("chunk_start") / stride).cast("int").alias("chunk_idx"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.size(chunk).cast("int").alias("n_chunk_tokens"),
            F.substring(F.md5(F.concat_ws(" ", chunk)), 1, 16).alias(
                "chunk_sig"
            ),
        )
    )


def quality_quantile_filter(
    df: DataFrame,
    frac: float = 0.8,
    group_col: str = "source",
    text_col: str = "text",
    exact: bool = True,
) -> DataFrame:
    """Per-group quality-quantile selection — keep each source's top
    (1-frac) quality slice, the relative-threshold form of quality
    filtering (an absolute cutoff over-prunes clean sources and
    under-prunes noisy ones; CCNet and FineWeb both threshold per
    bucket). Adds ``q_thr`` (the group's frac-quantile of the composite
    quality score, rounded 6 dp) and ``kept``.

    Scale: ONE keyed aggregation to per-group thresholds + a broadcast
    join back (group count is small by construction). ``exact=True``
    uses Spark's exact interpolated percentile, whose per-group state is
    the full value list — fine up to ~10M docs/group; at 100 TB pass
    ``exact=False`` for the t-digest ``approx_percentile`` (bounded
    state, same plan shape). The oracle pins the exact form: both
    engines interpolate at p*(n-1) over identical 6-dp-rounded scores,
    so the rounded thresholds agree."""
    q = quality_score(df, text_col=text_col)
    pct = (
        F.percentile("quality", F.lit(frac))
        if exact
        else F.approx_percentile("quality", F.lit(frac), F.lit(10000))
    )
    thr = q.groupBy(group_col).agg(F.round(pct, 6).alias("q_thr"))
    return q.join(F.broadcast(thr), group_col).withColumn(
        "kept", F.col("quality") >= F.col("q_thr")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: DataFrame | Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 retrieval: top-k documents for a bag-of-terms query
    (Robertson/Sparck Jones BM25, the +1-smoothed idf variant
    ``ln((N-df+0.5)/(df+0.5)+1)`` used by Lucene so scores stay
    non-negative). Completes the retrieval family next to
    :func:`inverted_index_stats` / :func:`tfidf_top_terms` — the lookup
    side of the index those build. Superset of the reference (no text
    surface there). Returns ``(id_col, score, rank)``, rank 1..k by
    (6-dp-rounded score desc, id asc) — ordering on the ROUNDED score so
    the tie-break is reproducible across engines.

    Scale: tokenize → per-doc length + 1-row (N, avgdl) aggregate →
    term-filtered tf. ``query_terms`` may be an inline sequence (compiles
    to a map-side ``isin`` — the interactive-query path, no join at all)
    or a DataFrame with a ``term`` column (broadcast equi-join — the
    batch path for thousand-term queries). df(term) derives from the
    filtered tf exactly (filtering by term does not change which docs
    contain it). The final top-k is a TakeOrdered over per-doc summed
    contributions — no global sort. N and avgdl count docs with ≥1
    token."""
    n_part = shuffle_parts(df.sparkSession)
    tok = df.repartition(n_part, id_col).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    if isinstance(query_terms, DataFrame):
        qt = query_terms.select("term").distinct()
        hits = tok.join(F.broadcast(qt), "term")
    else:
        hits = tok.filter(F.col("term").isin(list(query_terms)))
    tf = hits.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1.0
            ),
        )
        .withColumn(
            "c",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    scored = contrib.groupBy(id_col).agg(
        F.round(F.sum("c"), 6).alias("score")
    )
    # TakeOrdered first (distributed top-k, no global sort), THEN rank via
    # the broadcast theta-join (count of strictly-better rows + 1, the
    # bpe_vocab_table pattern) — ties broken on (rounded score, id), and
    # no unpartitioned window anywhere (the plan-audit invariant); the
    # self-join is k×k, constant.
    top = scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)
    other = F.broadcast(
        top.select(F.col("score").alias("__s2"), F.col(id_col).alias("__i2"))
    )
    better = (F.col("__s2") > F.col("score")) | (
        (F.col("__s2") == F.col("score")) & (F.col("__i2") < F.col(id_col))
    )
    return (
        top.join(other, better, "left")
        .groupBy(id_col, "score")
        .agg((F.count("__i2") + 1).cast("int").alias("rank"))
        .select(id_col, "score", "rank")
    )


def html_extract(
    df: DataFrame,
    text_col: str = "html",
    out_col: str = "clean_text",
) -> DataFrame:
    """Boilerplate HTML -> visible text: the first stage of every
    web-crawl corpus pipeline (C4/CCNet/RefinedWeb all start from WET/WARC
    tag-stripping before any quality filter in this module applies).

    Pure map-side codegen regex chain, same doctrine as pii_scrub:
      1. drop <script>/<style> blocks and <!-- comments --> wholesale
         (their CONTENT is not text; a bare tag-strip would leak JS/CSS);
      2. replace every remaining tag with a space (tags are word
         boundaries: '<p>a</p><p>b</p>' must not fuse to 'ab');
      3. unescape the six entities that dominate real HTML
         (&lt; &gt; &quot; &#39; &nbsp; and LAST &amp; — the standard
         unescape order, so '&amp;lt;' decodes to '&lt;' not '<');
      4. collapse whitespace runs and trim.

    Zero shuffles, fuses into the scan. Full entity tables / DOM-aware
    extraction (trafilatura-class) would be a pandas-UDF seam like
    normalize_text; the regex form is the 100 TB hot path.
    """
    s = F.col(text_col)
    for pat in (
        r"(?is)<script[^>]*>.*?</script>",
        r"(?is)<style[^>]*>.*?</style>",
        r"(?s)<!--.*?-->",
        r"<[^>]+>",
    ):
        s = F.regexp_replace(s, pat, " ")
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # last: '&amp;lt;' must yield '&lt;', not '<'
    ):
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return df.withColumn(out_col, s)


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: weighted least-squares
    slope/intercept of ln(freq) against ln(rank) — the standard corpus
    health statistic (natural text sits near slope -1; template/spam
    corpora flatten, boilerplate-heavy ones steepen).

    Rank is the frequency-CLASS midrank (ties at equal frequency share
    the midpoint of their rank range), which makes the statistic
    deterministic — per-token ranks under ties are arbitrary. The class
    relation is tiny (one row per distinct frequency, O(sqrt corpus
    tokens) by Heaps/Zipf), so the rank range comes from the broadcast
    theta-join pattern (count of strictly-higher classes — same shape as
    bm25_topk's rank), NOT a global window: the plan-audit invariant
    (no unpartitioned windows) holds even here.

    Plan: token explode -> keyed freq agg -> tiny class agg -> broadcast
    theta self-join -> one 1-row weighted-LS aggregate. The only
    corpus-sized shuffles are the two keyed aggregates.
    """
    toks = df.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    # referenced twice by the theta self-join below — cut so the corpus
    # explode + two keyed aggregates execute once
    classes = (
        freq.groupBy("f")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    other = F.broadcast(
        classes.select(F.col("f").alias("f2"), F.col("n").alias("n2"))
    )
    pts = (
        classes.join(other, F.col("f2") > F.col("f"), "left")
        .groupBy("f", "n")
        .agg(F.coalesce(F.sum("n2"), F.lit(0)).alias("cum_before"))
        .select(
            F.log(F.col("f").cast("double")).alias("y"),
            F.log(
                F.col("cum_before").cast("double")
                + (F.col("n").cast("double") + 1.0) / 2.0
            ).alias("x"),
            F.col("n").cast("double").alias("w"),
            F.col("n"),
            F.col("f"),
        )
    )
    s = pts.agg(
        F.sum("w").alias("sw"),
        F.sum(F.col("w") * F.col("x")).alias("swx"),
        F.sum(F.col("w") * F.col("y")).alias("swy"),
        F.sum(F.col("w") * F.col("x") * F.col("y")).alias("swxy"),
        F.sum(F.col("w") * F.col("x") * F.col("x")).alias("swx2"),
        F.sum("n").alias("n_vocab"),
        F.sum(F.col("n") * F.col("f")).alias("n_occurrences"),
    )
    slope = (
        F.col("sw") * F.col("swxy") - F.col("swx") * F.col("swy")
    ) / (F.col("sw") * F.col("swx2") - F.col("swx") * F.col("swx"))
    return s.select(
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("swy") - slope * F.col("swx")) / F.col("sw"), 6
        ).alias("zipf_intercept"),
        F.col("n_vocab").cast("long").alias("n_vocab"),
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
    )


def chat_turns(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    roles: tuple[str, ...] = ("system", "user", "assistant"),
) -> DataFrame:
    """Parse role-tagged chat transcripts ("role: content" lines) into one
    row per turn — the SFT/chat-data normalization stage (role-balance
    stats, per-role filtering, prompt-only dedup all start from this).

    Parsing is a two-step map-side chain deliberately free of regex
    LOOKAHEAD (Java regex has it, RE2 engines do not — cross-engine
    portability is a suite invariant): mark each turn start by rewriting
    "(^|\\n)role: " to SOH+role+STX control markers, split on SOH, then
    split each segment at STX into (role, content). Multi-line turn
    content (including lines that LOOK like prose) survives because only
    exact role markers at line starts are rewritten. Zero shuffles;
    output order is pinned by (id, turn_idx).

    Returns (id, turn_idx, role, content, n_words).
    """
    soh, stx = "\u0001", "\u0002"
    alts = "|".join(roles)
    marked = F.regexp_replace(
        F.col(text_col), f"(^|\\n)({alts}): ", f"{soh}$2{stx}"
    )
    parts = F.filter(F.split(marked, soh), lambda p: p != "")
    return (
        df.select(F.col(id_col), F.posexplode(parts).alias("turn_idx", "__p"))
        .select(
            id_col,
            "turn_idx",
            F.split_part(F.col("__p"), F.lit(stx), F.lit(1)).alias("role"),
            F.split_part(F.col("__p"), F.lit(stx), F.lit(2)).alias("content"),
        )
        .withColumn(
            "n_words",
            F.size(
                F.filter(
                    F.split(F.col("content"), r"\s+"), lambda t: t != ""
                )
            ),
        )
    )


def rrf_fuse(
    rankings: Sequence[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    c: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher RRF) of N ranked
    retrieval lists: score(d) = sum over lists of 1/(c + rank_list(d)),
    the standard score-free way to combine lexical (BM25) and dense
    (embedding cosine) retrieval into one hybrid ranking. Superset of the
    reference (no retrieval surface there); completes the retrieval
    family next to :func:`bm25_topk` as its rank CONSUMER.

    Each input is a (name, df) pair where df holds (id_col, rank_col)
    for an already-truncated top-N list, so everything here is
    constant-sized: the fusion is a chain of full-outer joins in the
    given list order with the contribution sum written as an explicit
    left-to-right ``+`` chain — addition order is FIXED by construction,
    never by shuffle arrival, so the fused double is deterministic and a
    SQL oracle reproduces it bit-for-bit. Per-list ranks survive as
    ``<name>_rank`` (NULL = not retrieved by that list). Output top-k by
    (9-dp-rounded score desc, id asc) via TakeOrdered — no global sort,
    no window.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one (name, ranking) pair")
    fused = None
    for name, rdf in rankings:
        side = rdf.select(
            F.col(id_col), F.col(rank_col).alias(f"{name}_rank")
        )
        fused = side if fused is None else fused.join(side, id_col, "full_outer")
    contribs = [
        F.coalesce(
            1.0 / (F.lit(float(c)) + F.col(f"{name}_rank").cast("double")),
            F.lit(0.0),
        )
        for name, _ in rankings
    ]
    score = contribs[0]
    for term in contribs[1:]:
        score = score + term
    scored = fused.withColumn("rrf_score", F.round(score, 9))
    return (
        scored.orderBy(F.col("rrf_score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "rrf_score", *[f"{n}_rank" for n, _ in rankings])
    )


def url_canonicalize(
    df: DataFrame, url_col: str = "url", out: str = "canonical_url"
) -> DataFrame:
    """URL canonicalization for dedup keys — the normalization every
    web-corpus pipeline runs before URL-level dedup (C4/CCNet dedup by
    URL; the same URL arrives spelled dozens of ways across dumps):
    lowercase scheme+host, strip default ports (:443/:80), drop the
    fragment, remove tracking params (utm_*, fbclid, gclid), repair the
    orphaned '&' a removed leading param leaves, collapse duplicate
    path slashes, and strip trailing '/' and empty '?'.

    Pure map-side regexp chain (fuses into the scan; zero shuffles,
    zero Python). Every pattern is RE2-safe (no lookahead/backrefs in
    the MATCH side) so an oracle can replay the chain verbatim in
    engines whose regex is RE2 — the Java-regex/RE2 common subset is
    the contract. Caveats (documented, not bugs): '//'-collapse applies
    to the whole tail, so a query-string containing '//' would also
    collapse (no scheme-relative '//' survives after the host split);
    param removal assumes tracking params are not the only thing
    between '?' and a kept param more than once per position — the
    orphan-fix pass repairs the single leading case, which is the form
    real trackers append."""
    u = F.col(url_col)
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)", 1)
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(.*)", 1)
    chead = F.regexp_replace(F.lower(head), r":(443|80)$", "")
    crest = F.regexp_replace(rest, r"#.*$", "")
    crest = F.regexp_replace(
        crest, r"[?&](utm_[a-z]+|fbclid|gclid)=[^&#]*", ""
    )
    # Non-greedy anchor via negated class: [^?&]* stops at the FIRST '&'
    # (a greedy [^?]* would backtrack to the LAST '&' when several kept
    # params follow a removed leading tracker, producing a malformed URL
    # and splitting canonical keys for the same logical URL).
    crest = F.regexp_replace(crest, r"^([^?&]*)&", r"$1?")
    crest = F.regexp_replace(crest, r"//+", "/")
    crest = F.regexp_replace(crest, r"/\?", "?")
    crest = F.regexp_replace(crest, r"/+$", "")
    crest = F.regexp_replace(crest, r"\?$", "")
    return df.withColumn(out, F.concat(chead, crest))
