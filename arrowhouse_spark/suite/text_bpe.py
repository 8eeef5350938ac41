"""Query suite chunk: see the package __init__ docstring. Positional slice of the original suite.py (registration order is load-bearing for the driver rotation — do not reorder)."""

# ruff: noqa: F401  (shared header imports; unused ones kept for uniformity)
from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arrowhouse_spark.session import shuffle_parts

from arrowhouse_spark.compile import apply_program
from arrowhouse_spark.functions import hashing
from arrowhouse_spark.operators.dedup import (
    dedup_exact,
    minhash_dedup,
    ngram_jaccard_pairs,
    simhash,
)
from arrowhouse_spark.operators.asof import asof_join
from arrowhouse_spark.operators.merge import merge_sorted, replace_merge_agg
from arrowhouse_spark.operators.sessions import session_stats
from arrowhouse_spark.operators.setops import except_all, intersect
from arrowhouse_spark.operators.similarity import (
    ann_cosine_ivf_kmeans,
    ann_cosine_lsh_multi,
    cosine_topk_query,
    embedding_neardup_pairs,
)
from arrowhouse_spark.operators.sort import SortKey, top_k
from arrowhouse_spark.operators.text import (
    LANG_MARKERS,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from arrowhouse_spark.program import (
    AggOp,
    AggregateAssign,
    Assign,
    GroupBy,
    Op,
    Program,
    ProgramStep,
    const,
)


from arrowhouse_spark.suite import (
    _doc_shingles_guarded,
    _events,
    _rel_cached,
    _t,
    register,
)
from arrowhouse_spark.suite.dedup_core import (
    _minhash_sigs_prefix,
)

@register(
    "doc_url_filter",
    """
    WITH u AS (
      SELECT doc_id,
             'https://' || CASE doc_id % 5
                WHEN 0 THEN 'spam.example.com'
                WHEN 1 THEN 'ads.example.net'
                WHEN 2 THEN 'blog.example.org'
                WHEN 3 THEN 'news.example.com'
                ELSE 'docs.example.io' END
             || '/p/' || doc_id
             || CASE WHEN doc_id % 17 = 0 THEN '?ref=casino-bonus' ELSE '' END
             AS url
      FROM documents
    )
    SELECT doc_id, url,
           lower(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1)) AS domain,
           lower(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1))
             IN ('spam.example.com', 'ads.example.net') AS blocked_domain,
           contains(lower(url), 'casino') AS blocked_keyword,
           (NOT lower(regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1))
             IN ('spam.example.com', 'ads.example.net'))
           AND NOT contains(lower(url), 'casino') AS url_pass
    FROM u
    """,
)
def doc_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain triage (operators/text.py:url_filter): host extraction +
    broadcast blocklist join + keyword scan — the C4/RefinedWeb/FineWeb
    pre-download filter. The fixture has no URL column, so one is
    SYNTHESIZED deterministically from doc_id on both sides (the PII
    injection discipline): five rotating domains, two of them blocklisted,
    plus a 'casino' spam keyword on every 17th URL — so all four signals'
    true and false paths are pinned by the hash."""
    from arrowhouse_spark.operators.text import url_filter

    docs = _t(spark, sf_dir, "documents")
    with_url = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.element_at(
                F.array(
                    F.lit("spam.example.com"),
                    F.lit("ads.example.net"),
                    F.lit("blog.example.org"),
                    F.lit("news.example.com"),
                    F.lit("docs.example.io"),
                ),
                (F.col("doc_id") % 5 + 1).cast("int"),
            ),
            F.lit("/p/"),
            F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 17 == 0, F.lit("?ref=casino-bonus")
            ).otherwise(F.lit("")),
        ).alias("url"),
    )
    out = url_filter(
        with_url,
        blocked_domains=["spam.example.com", "ads.example.net"],
        blocked_keywords=["casino"],
    )
    return out.select(
        "doc_id", "url", "domain", "blocked_domain", "blocked_keyword", "url_pass"
    )


@register(
    "eval_contamination_report",
    """
    WITH ctoks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
      FROM documents WHERE doc_id % 97 != 0
    ), cgrams AS (
      SELECT doc_id,
             unnest(list_distinct([array_to_string(w[i:i+12], ' ')
                                   FOR i IN range(1, len(w) - 11)])) AS g
      FROM ctoks
    ), etoks AS (
      SELECT doc_id AS eval_id,
             list_filter(string_split(text, ' '), x -> x != '') AS w
      FROM documents WHERE doc_id % 97 = 0
    ), egrams AS (
      SELECT eval_id,
             unnest(list_distinct([array_to_string(w[i:i+12], ' ')
                                   FOR i IN range(1, len(w) - 11)])) AS g
      FROM etoks
    ), hits AS (
      SELECT e.eval_id,
             CAST(count(DISTINCT e.g) AS BIGINT) AS n_hit_grams,
             CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_corpus_docs
      FROM egrams e JOIN cgrams c ON e.g = c.g
      GROUP BY e.eval_id
    )
    SELECT t.eval_id,
           coalesce(h.n_hit_grams, 0) AS n_hit_grams,
           coalesce(h.n_corpus_docs, 0) AS n_corpus_docs,
           coalesce(h.n_hit_grams, 0) >= 1 AS is_compromised
    FROM etoks t LEFT JOIN hits h USING (eval_id)
    """,
)
def eval_contamination_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse decontamination (operators/text.py:contamination_report):
    per EVAL document, its distinct 13-grams found in the training corpus
    and the distinct corpus docs containing them — the report a benchmark
    owner publishes (GPT-3 §C). The doc_id%97 slice plays the eval set
    against the complementary corpus; exact duplicates in the fixture
    guarantee non-trivial hits, and evals with no twin pin the zero row."""
    from arrowhouse_spark.operators.text import contamination_report

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_report(corpus, ev, ngram_n=13)


@register(
    "vocab_encode_docs",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
      FROM documents
    ), pe AS (
      SELECT doc_id, i - 1 AS pos, w[i] AS tok
      FROM toks, unnest(generate_series(1, len(w))) AS t(i)
    ), tf AS (
      SELECT tok, count(*) AS tf FROM pe GROUP BY tok
    ), top AS (
      SELECT tok, CAST(row_number() OVER (ORDER BY tf DESC, tok ASC) AS INTEGER) AS tid
      FROM tf ORDER BY tf DESC, tok ASC LIMIT 500
    ), enc AS (
      SELECT pe.doc_id, pe.pos, coalesce(top.tid, 0) AS tid
      FROM pe LEFT JOIN top USING (tok)
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS INTEGER) AS n_unk,
           CAST(sum((pos + 1) * tid) AS BIGINT) AS ids_checksum
    FROM enc GROUP BY doc_id
    """,
)
def vocab_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-vocabulary encoding (operators/text.py:vocab_encode): top-500
    vocab by (count desc, token asc), ids 1..500, UNK=0, each doc encoded
    as its id sequence. The position-weighted checksum Σ(pos+1)·id pins the
    full sequence CONTENT AND ORDER through the hash compare without
    shipping arrays across the oracle boundary; n_unk pins the vocab
    membership set."""
    from arrowhouse_spark.operators.text import vocab_encode

    out = vocab_encode(
        _t(spark, sf_dir, "documents"), vocab_size=500, with_ids=False
    )
    return out.select("doc_id", "n_tokens", "n_unk", "ids_checksum")


@register(
    "source_kl_divergence",
    """
    WITH st AS (
      SELECT src, tok, count(*) AS stf FROM (
        SELECT source AS src,
               unnest(list_filter(string_split(text, ' '), x -> x != '')) AS tok
        FROM documents
      ) GROUP BY src, tok
    ), corpus AS (
      SELECT tok, sum(stf) AS ctf FROM st GROUP BY tok
    ), s_tot AS (
      SELECT src, sum(stf) AS s_n FROM st GROUP BY src
    ), c_tot AS (
      SELECT sum(ctf) AS c_n FROM corpus
    )
    SELECT st.src AS source,
           CAST(max(s_tot.s_n) AS BIGINT) AS n_tokens,
           round(sum((st.stf / s_tot.s_n)
                     * ln((st.stf / s_tot.s_n) / (corpus.ctf / c_tot.c_n))), 3)
             AS kl_nats
    FROM st JOIN corpus USING (tok) JOIN s_tot USING (src), c_tot
    GROUP BY st.src
    """,
)
def source_kl_divergence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mix divergence diagnostic (operators/text.py:
    source_kl_divergence): KL(p_source ‖ p_corpus) over token
    distributions, per source — the measurement a pipeline reads before
    setting mixture weights. Identical rational p/q on both engines;
    3-dp rounding absorbs summation-order noise in the Σ p·ln(p/q)."""
    from arrowhouse_spark.operators.text import source_kl_divergence

    return source_kl_divergence(_t(spark, sf_dir, "documents"))


@register(
    "doc_encoding_quality",
    """
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 31 = 0
                  THEN text || ' café �� ba' || chr(7) || 'd'
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(length(text) - length(regexp_replace(text, '�', '', 'g'))
             AS INTEGER) AS n_replacement,
           round((length(text) - length(regexp_replace(text,
                 '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')))
                 / greatest(length(text), 1), 6) AS ctrl_ratio,
           round((length(text) - length(regexp_replace(text,
                 '[^\\x00-\\x7f]', '', 'g')))
                 / greatest(length(text), 1), 6) AS non_ascii_ratio,
           (length(text) = length(regexp_replace(text, '�', '', 'g'))
            AND length(text) = length(regexp_replace(text,
                 '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'))
            AND round((length(text) - length(regexp_replace(text,
                 '[^\\x00-\\x7f]', '', 'g')))
                 / greatest(length(text), 1), 6) <= 0.25) AS encoding_clean
    FROM base
    """,
)
def doc_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding/mojibake QC (operators/text.py:encoding_quality). The
    fixture is pure ASCII, so every 31st doc gets identical synthesized
    noise on both sides — an é (legit non-ASCII), two U+FFFD tombstones,
    and a BEL control — pinning all four signals' non-trivial paths; the
    clean docs pin the all-zero path. Codepoint counting (not bytes) on
    both engines; regex classes from the PII cross-engine discipline."""
    from arrowhouse_spark.operators.text import encoding_quality

    docs = _t(spark, sf_dir, "documents")
    noisy = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 31 == 0,
            F.concat(F.col("text"), F.lit(" café �� ba\x07d")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return encoding_quality(noisy)


@register(
    "doc_bigram_logprob",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
      FROM documents
    ), uni AS (
      SELECT tok, count(*) AS utf
      FROM (SELECT unnest(w) AS tok FROM toks) GROUP BY tok
    ), tot AS (
      SELECT sum(utf) AS total FROM uni
    ), grams AS (
      SELECT doc_id, w[i] AS prev, w[i+1] AS tok
      FROM toks, unnest(generate_series(1, len(w) - 1)) AS t(i)
    ), bi AS (
      SELECT prev, tok, count(*) AS btf FROM grams GROUP BY prev, tok
    )
    SELECT g.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams_lm,
           round(avg(-ln(0.7 * (bi.btf / up.utf)
                         + 0.3 * (ut.utf / tot.total))), 3) AS mean_neg_logprob2
    FROM grams g
    JOIN bi USING (prev, tok)
    JOIN uni up ON up.tok = g.prev
    JOIN uni ut ON ut.tok = g.tok, tot
    GROUP BY g.doc_id
    """,
)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM quality score (operators/text.py:
    bigram_logprob_score) — the order-1 step toward the CCNet KenLM
    perplexity filter, λ=0.7 bigram + 0.3 unigram floor from the corpus
    itself. The oracle replays the identical mixture in SQL; 3-dp rounding
    absorbs libm/summation-order ulp noise exactly as in
    doc_unigram_logprob."""
    from arrowhouse_spark.operators.text import bigram_logprob_score

    return bigram_logprob_score(_t(spark, sf_dir, "documents"), lam=0.7)


@register(
    "doc_dup_spans",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS w
      FROM documents
    ), wins AS (
      SELECT doc_id, i - 1 AS pos, array_to_string(w[i:i+7], ' ') AS win
      FROM toks, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS t(i)
    ), wc AS (
      SELECT win, count(*) AS c FROM wins GROUP BY win
    ), dup AS (
      SELECT doc_id, pos FROM wins JOIN wc USING (win) WHERE wc.c >= 2
    ), nd AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_windows
      FROM dup GROUP BY doc_id
    ), cov AS (
      SELECT doc_id, count(DISTINCT tp) AS covered
      FROM dup, unnest(generate_series(pos, pos + 7)) AS u(tp)
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.w) AS INTEGER) AS n_tokens,
           CAST(greatest(len(t.w) - 7, 0) AS INTEGER) AS n_windows,
           coalesce(nd.n_dup_windows, 0) AS n_dup_windows,
           round(coalesce(cov.covered, 0) / greatest(len(t.w), 1), 6)
             AS dup_token_frac
    FROM toks t
    LEFT JOIN nd USING (doc_id) LEFT JOIN cov USING (doc_id)
    """,
)
def doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span flagging (operators/dedup.py:
    dup_spans; Lee et al. 2022): 8-token sliding windows, a span is
    duplicated when its exact token sequence occurs ≥2 times anywhere in
    the corpus; per-doc output counts dup windows and the token fraction
    covered by the merged span union. The engine merges overlapping spans
    with a codegen'd interval fold over sorted starts; the oracle
    recomputes coverage by brute-force position union — two independent
    algorithms for the same quantity. Engine keys the corpus count on
    xxhash64(window); the oracle groups the window strings themselves, so
    a hash collision would surface as a mismatch."""
    from arrowhouse_spark.operators.dedup import dup_spans

    # shared-relation discipline: the operator caches its hashed-window
    # relation per CALL; repeated bench passes would pin a fresh copy each
    # time, so the suite session-caches ONE windows relation and passes it in
    key = (spark.sparkContext.applicationId, sf_dir, "dupwin", 8)

    def build() -> DataFrame:
        from arrowhouse_spark.operators.dedup import ngrams_from_tokens
        from arrowhouse_spark.operators.text import tokens

        docs = _t(spark, sf_dir, "documents")
        n_part = shuffle_parts(spark)
        return (
            docs.select(
                F.col("doc_id"),
                F.posexplode(
                    ngrams_from_tokens(tokens("text"), 8)
                ).alias("pos", "__win"),
            )
            .select("doc_id", "pos", F.xxhash64("__win").alias("__h"))
            .repartition(n_part, "__h")
            .persist()
        )

    return dup_spans(
        _t(spark, sf_dir, "documents"), window=8, min_count=2,
        windows=_rel_cached(key, build),
    )


@register(
    "semantic_dedup_embeddings",
    """
    WITH base AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, embedding
      FROM embeddings WHERE vec_id % 25 = 0
    ), init AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
             embedding::DOUBLE[] AS cv
      FROM (SELECT * FROM base ORDER BY vec_id LIMIT 8)
    ), scored AS (
      SELECT e.vec_id, i.c,
             round(list_cosine_similarity(e.embedding::DOUBLE[], i.cv), 6) AS cos
      FROM base e CROSS JOIN init i
    ), assign AS (
      SELECT vec_id, c AS cluster FROM (
        SELECT vec_id, c,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY cos DESC, c ASC
               ) AS rk
        FROM scored
      ) WHERE rk = 1
    ), lower_cos AS (
      SELECT a.vec_id,
             max(round(list_cosine_similarity(
               ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]), 6)) AS max_dup_cos
      FROM assign a
      JOIN assign b ON b.cluster = a.cluster AND b.vec_id < a.vec_id
      JOIN base ea ON ea.vec_id = a.vec_id
      JOIN base eb ON eb.vec_id = b.vec_id
      GROUP BY a.vec_id
    )
    SELECT a.vec_id, CAST(a.cluster AS INTEGER) AS cluster,
           p.max_dup_cos,
           coalesce(p.max_dup_cos < 0.95, TRUE) AS is_kept
    FROM assign a LEFT JOIN lower_cos p ON p.vec_id = a.vec_id
    """,
)
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.py:semantic_dedup; Abbas et al. 2023):
    k-means cells over the embedding corpus, then within-cluster cosine
    pruning — drop any vector whose cosine to a lower-id cluster-mate is
    ≥ 0.95. The fixture's organic pairs top out near cos 0.6, so exact
    copies of every 25th vector (vec_id+100000) are synthesized identically
    on both sides: each copy must land in its source's cluster with
    max_dup_cos 1.0 and is_kept=false, pinning the drop path, while all
    organic rows stay kept. The oracle replays the ENTIRE pipeline in SQL:
    iters=0 + min_id init make the centroids engine-independent, assignment
    is the rank-1 row of the rounded cosine cross join (ties toward the
    lowest centroid index, matching numpy argmax), and the keep rule is a
    lower-id self-join max. DOUBLE[] casts keep DuckDB in float64 so the
    6-dp rounding lands identically on both engines."""
    from arrowhouse_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    copies = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    base = emb.select("vec_id", "embedding").unionByName(copies)
    out = semantic_dedup(
        base, n_clusters=8, iters=0, threshold=0.95, init="min_id"
    )
    return out.select(
        F.col("id").alias("vec_id"), "cluster", "max_dup_cos", "is_kept"
    )


@register(
    "doc_chunk_split",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS t
      FROM documents
    ), base AS (
      SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0
    ), st AS (
      SELECT doc_id, t, unnest(range(0, n, 48)) AS cs FROM base
    )
    SELECT doc_id,
           CAST(cs // 48 AS INTEGER) AS chunk_idx,
           CAST(cs AS INTEGER) AS chunk_start,
           CAST(len(list_slice(t, cs + 1, cs + 64)) AS INTEGER)
             AS n_chunk_tokens,
           substr(md5(array_to_string(list_slice(t, cs + 1, cs + 64), ' ')),
                  1, 16) AS chunk_sig
    FROM st
    """,
)
def doc_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (operators/text.py:chunk_split): every
    document split into 64-token chunks with 16 tokens of overlap
    (stride 48), one output row per chunk carrying its offset, length,
    and a 16-hex md5 signature of the space-rejoined chunk tokens — the
    signature pins both the slice boundaries and the content, so an
    off-by-one in either engine's slicing flips the hash. Map-side only
    (sequence + explode + slice), no shuffle; the oracle replays the
    same stride arithmetic with DuckDB's range/list_slice."""
    from arrowhouse_spark.operators.text import chunk_split

    return chunk_split(
        _t(spark, sf_dir, "documents"), chunk_size=64, overlap=16
    )


@register(
    "corpus_snapshot_diff",
    r"""
    WITH newsnap AS (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END
               AS text
      FROM documents WHERE doc_id % 17 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text || ' new' AS text
      FROM documents WHERE doc_id % 19 = 0
    ), ofp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fpo
      FROM documents
    ), nfp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fpn
      FROM newsnap
    )
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN fpo IS NOT DISTINCT FROM fpn THEN 'unchanged'
                ELSE 'changed' END AS status
    FROM ofp o FULL OUTER JOIN nfp n ON n.doc_id = o.doc_id
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day corpus diff (operators/snapshot.py:snapshot_diff): the
    'new' snapshot is derived deterministically from the documents table on
    both sides — every 17th doc removed, every surviving 13th re-crawled
    with changed content, every 19th spawning a new doc_id — and the diff
    reports one status row per id in either snapshot. Exercises the
    full-outer fingerprint join: one keyed shuffle of (id, md5) pairs, no
    text movement; at 100 TB both snapshots come bucketed by doc_id so the
    join is a co-located sort-merge."""
    from arrowhouse_spark.operators.snapshot import snapshot_diff

    docs = _t(spark, sf_dir, "documents")
    new_snap = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 13 == 0, F.concat("text", F.lit(" rev2"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 19 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat("text", F.lit(" new")).alias("text"),
            )
        )
    )
    return snapshot_diff(docs, new_snap)


@register(
    "label_centroid_sim",
    r"""
    WITH ex AS (
      SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS pos
      FROM embeddings
    ), cent AS (
      SELECT label, pos, round(avg(v), 9) AS m FROM ex GROUP BY label, pos
    )
    SELECT a.label AS label_a, b.label AS label_b,
           round(sum(a.m * b.m) /
                 (sqrt(sum(a.m * a.m)) * sqrt(sum(b.m * b.m))), 6)
             AS centroid_cos
    FROM cent a JOIN cent b ON b.pos = a.pos AND a.label < b.label
    GROUP BY a.label, b.label
    """,
)
def label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label embedding centroids
    (operators/similarity.py:label_centroid_cosine) — the source-affinity
    matrix a curation pipeline consults before setting mixing weights.
    One keyed mean aggregation (n_labels x dim keys however big the
    corpus), then a broadcast self-join on the dimension index; centroid
    means round to 9 dp on both sides so the hash compare is independent
    of float summation order."""
    from arrowhouse_spark.operators.similarity import label_centroid_cosine

    return label_centroid_cosine(_t(spark, sf_dir, "embeddings"))


def _bpe_oracle_sql(k: int, encode: bool = False) -> str:
    """Unrolled K-round BPE oracle: round i counts adjacent pairs of the
    round-(i-1) corpus, takes the (count DESC, pair) top-1, and applies the
    merge with the same boundary-wrapped literal replace as the engine
    (operators/bpe.py module docstring explains the encoding). With
    ``encode=True`` the corpus CTEs carry doc_id, all K merges are applied,
    and the output is the per-document encoded token stats instead of the
    merge table."""
    s = "chr(31)"
    idc = "doc_id, " if encode else ""
    parts = [
        f"""WITH d0 AS (
      SELECT {idc}{s} || array_to_string(
               list_filter(string_split(text, ' '), x -> x != ''),
               {s}||{s}) || {s} AS s
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), x -> x != '')) > 0
    )"""
    ]
    for i in range(1, k + 1):
        prev = f"d{i - 1}"
        parts.append(
            f""", p{i} AS (
      SELECT unnest(range(1, len(a))) AS ix, a FROM (
        SELECT string_split(substr(s, 2, length(s) - 2), {s}||{s}) AS a
        FROM {prev}
      )
    ), t{i} AS (
      SELECT pair, cnt FROM (
        SELECT pair, count(*) AS cnt FROM (
          SELECT a[ix] || {s} || a[ix + 1] AS pair FROM p{i}
        ) GROUP BY pair
      ) ORDER BY cnt DESC, pair LIMIT 1
    )"""
        )
        if i < k or encode:
            parts.append(
                f""", d{i} AS (
      SELECT {idc}replace(s,
               {s} || replace(t{i}.pair, {s}, {s}||{s}) || {s},
               {s} || replace(t{i}.pair, {s}, '+') || {s}) AS s
      FROM {prev}, t{i}
    )"""
            )
    if encode:
        sel = (
            f"SELECT doc_id,\n"
            f"      CAST(len(string_split(substr(s, 2, length(s) - 2),"
            f" {s}||{s})) AS INTEGER) AS n_bpe_tokens,\n"
            f"      substr(md5(array_to_string(string_split("
            f"substr(s, 2, length(s) - 2), {s}||{s}), ' ')), 1, 16)"
            f" AS bpe_checksum\n    FROM d{k}"
        )
    else:
        sel = "\n    UNION ALL\n    ".join(
            f"SELECT {i} AS it, split_part(pair, {s}, 1) AS left_tok,"
            f" split_part(pair, {s}, 2) AS right_tok,"
            f" CAST(cnt AS BIGINT) AS pair_count FROM t{i}"
            for i in range(1, k + 1)
        )
    return "".join(parts) + "\n    " + sel


def _bpe_batched_oracle_sql(
    n_merges: int,
    batch_size: int,
    encode: bool = False,
    vocab: bool = False,
    vocab_size: int = 256,
) -> str:
    """Unrolled batched-BPE oracle (round-6 verdict #1): pass i ranks the
    pair counts (cnt DESC, pair ASC), keeps the top-``batch_size`` pairs
    sharing no token with ANY higher-ranked pair (per-token min-rank
    equality — the same keyed rule the engine evaluates as a min-struct
    aggregation), and applies ALL selected merges with nested literal
    replaces. Token-disjointness makes the nesting order irrelevant; the
    ranked j order used here mirrors the engine's sorted fold. The
    never-matching sentinel repeat(chr(31),4) fills absent ranks (between
    tokens the encoding has exactly two separators, so four in a row
    cannot occur) — keeping each replace total instead of NULL-poisoning
    the chain."""
    s = "chr(31)"
    idc = "doc_id, " if encode else ""
    apply_all = encode or vocab  # both need every pass's merges applied
    n_passes = -(-n_merges // batch_size)
    parts = [
        f"""WITH d0 AS MATERIALIZED (
      SELECT {idc}{s} || array_to_string(
               list_filter(string_split(text, ' '), x -> x != ''),
               {s}||{s}) || {s} AS s
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), x -> x != '')) > 0
    )"""
    ]
    for i in range(1, n_passes + 1):
        k = min(batch_size, n_merges - batch_size * (i - 1))
        prev = f"d{i - 1}"
        parts.append(
            f""", rk{i} AS MATERIALIZED (
      SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rk
      FROM (
        SELECT pair, count(*) AS cnt FROM (
          SELECT a[ix] || {s} || a[ix + 1] AS pair FROM (
            SELECT unnest(range(1, len(a))) AS ix, a FROM (
              SELECT string_split(substr(s, 2, length(s) - 2), {s}||{s}) AS a
              FROM {prev}
            )
          )
        ) GROUP BY pair
      )
    ), tb{i} AS MATERIALIZED (
      SELECT tok, min(rk) AS mrk FROM (
        SELECT split_part(pair, {s}, 1) AS tok, rk FROM rk{i}
        UNION ALL
        SELECT split_part(pair, {s}, 2) AS tok, rk FROM rk{i}
      ) GROUP BY tok
    ), sel{i} AS MATERIALIZED (
      SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS j
      FROM rk{i} r
      JOIN tb{i} t1
        ON t1.tok = split_part(r.pair, {s}, 1) AND t1.mrk = r.rk
      JOIN tb{i} t2
        ON t2.tok = split_part(r.pair, {s}, 2) AND t2.mrk = r.rk
      QUALIFY j <= {k}
    )"""
        )
        if i < n_passes or apply_all:
            expr = "s"
            for j in range(1, k + 1):
                pat = (
                    f"coalesce((SELECT {s} || replace(pair, {s}, {s}||{s})"
                    f" || {s} FROM sel{i} WHERE j = {j}),"
                    f" repeat(chr(31), 4))"
                )
                mrg = (
                    f"coalesce((SELECT {s} || replace(pair, {s}, '+')"
                    f" || {s} FROM sel{i} WHERE j = {j}), '')"
                )
                expr = f"replace({expr},\n        {pat},\n        {mrg})"
            parts.append(
                f""", d{i} AS MATERIALIZED (
      SELECT {idc}{expr} AS s
      FROM {prev}
    )"""
            )
    if vocab:
        # tokenizer vocab artifact: distinct final tokens of the merged
        # corpus ranked by (tf DESC, token ASC), ids 1..V — the same total
        # deterministic order vocab_encode assigns
        sel = (
            f"SELECT tok, CAST(row_number() OVER (ORDER BY tf DESC, tok)"
            f" AS INTEGER) AS tid, CAST(tf AS BIGINT) AS tf FROM (\n"
            f"      SELECT tok, count(*) AS tf FROM (\n"
            f"        SELECT unnest(string_split(substr(s, 2, length(s) - 2),"
            f" {s}||{s})) AS tok FROM d{n_passes}\n"
            f"      ) GROUP BY tok\n"
            f"    ) ORDER BY tf DESC, tok LIMIT {vocab_size}"
        )
    elif encode:
        sel = (
            f"SELECT doc_id,\n"
            f"      CAST(len(string_split(substr(s, 2, length(s) - 2),"
            f" {s}||{s})) AS INTEGER) AS n_bpe_tokens,\n"
            f"      substr(md5(array_to_string(string_split("
            f"substr(s, 2, length(s) - 2), {s}||{s}), ' ')), 1, 16)"
            f" AS bpe_checksum\n    FROM d{n_passes}"
        )
    else:
        sel = "\n    UNION ALL\n    ".join(
            f'SELECT CAST({i} AS INTEGER) AS "pass",'
            f" split_part(pair, {s}, 1) AS left_tok,"
            f" split_part(pair, {s}, 2) AS right_tok,"
            f" CAST(cnt AS BIGINT) AS pair_count FROM sel{i}"
            for i in range(1, n_passes + 1)
        )
    return "".join(parts) + "\n    " + sel


def _bpe_pretrained_oracle_sql(n_merges: int, batch_size: int) -> str:
    """Oracle for the train-once/encode-often split: batched-BPE-train on
    the EVEN documents (same ranking + non-interference rule as
    _bpe_batched_oracle_sql), then apply every pass's merges IN TRAINING
    ORDER to the held-out ODD documents the trainer never saw."""
    s = "chr(31)"
    n_passes = -(-n_merges // batch_size)

    def rep_chain(col: str, sel: str, k: int) -> str:
        expr = col
        for j in range(1, k + 1):
            pat = (
                f"coalesce((SELECT {s} || replace(pair, {s}, {s}||{s})"
                f" || {s} FROM {sel} WHERE j = {j}),"
                f" repeat(chr(31), 4))"
            )
            mrg = (
                f"coalesce((SELECT {s} || replace(pair, {s}, '+')"
                f" || {s} FROM {sel} WHERE j = {j}), '')"
            )
            expr = f"replace({expr},\n        {pat},\n        {mrg})"
        return expr

    parts = [
        f"""WITH tr0 AS MATERIALIZED (
      SELECT {s} || array_to_string(
               list_filter(string_split(text, ' '), x -> x != ''),
               {s}||{s}) || {s} AS s
      FROM documents
      WHERE doc_id % 2 = 0
        AND len(list_filter(string_split(text, ' '), x -> x != '')) > 0
    ), ho0 AS MATERIALIZED (
      SELECT doc_id, {s} || array_to_string(
               list_filter(string_split(text, ' '), x -> x != ''),
               {s}||{s}) || {s} AS s
      FROM documents
      WHERE doc_id % 2 = 1
        AND len(list_filter(string_split(text, ' '), x -> x != '')) > 0
    )"""
    ]
    for i in range(1, n_passes + 1):
        k = min(batch_size, n_merges - batch_size * (i - 1))
        parts.append(
            f""", rk{i} AS MATERIALIZED (
      SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rk
      FROM (
        SELECT pair, count(*) AS cnt FROM (
          SELECT a[ix] || {s} || a[ix + 1] AS pair FROM (
            SELECT unnest(range(1, len(a))) AS ix, a FROM (
              SELECT string_split(substr(s, 2, length(s) - 2), {s}||{s}) AS a
              FROM tr{i - 1}
            )
          )
        ) GROUP BY pair
      )
    ), tb{i} AS MATERIALIZED (
      SELECT tok, min(rk) AS mrk FROM (
        SELECT split_part(pair, {s}, 1) AS tok, rk FROM rk{i}
        UNION ALL
        SELECT split_part(pair, {s}, 2) AS tok, rk FROM rk{i}
      ) GROUP BY tok
    ), sel{i} AS MATERIALIZED (
      SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS j
      FROM rk{i} r
      JOIN tb{i} t1
        ON t1.tok = split_part(r.pair, {s}, 1) AND t1.mrk = r.rk
      JOIN tb{i} t2
        ON t2.tok = split_part(r.pair, {s}, 2) AND t2.mrk = r.rk
      QUALIFY j <= {k}
    )"""
        )

        if i < n_passes:
            parts.append(
                f""", tr{i} AS MATERIALIZED (
      SELECT {rep_chain("s", f"sel{i}", k)} AS s
      FROM tr{i - 1}
    )"""
            )
        parts.append(
            f""", ho{i} AS MATERIALIZED (
      SELECT doc_id, {rep_chain("s", f"sel{i}", k)} AS s
      FROM ho{i - 1}
    )"""
        )
    parts.append(
        f"""
    SELECT doc_id,
      CAST(len(string_split(substr(s, 2, length(s) - 2),
        {s}||{s})) AS INTEGER) AS n_bpe_tokens,
      substr(md5(array_to_string(string_split(
        substr(s, 2, length(s) - 2), {s}||{s}), ' ')), 1, 16)
        AS bpe_checksum
    FROM ho{n_passes}"""
    )
    return "".join(parts)


@register(
    "bpe_vocab_table",
    _bpe_batched_oracle_sql(16, 8, vocab=True, vocab_size=256),
)
def bpe_vocab_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third tokenizer artifact (after the merge table and the
    encoder): the vocabulary — train 16 batched merges, apply them, and
    rank the merged corpus's distinct tokens by (frequency DESC, token
    ASC) into ids 1..256. Rank assignment uses vocab_encode's documented
    broadcast theta-join (count of strictly-higher-ranked entries + 1)
    instead of a global row_number window — the single-task shape the plan
    audit forbids. The oracle replays training, application, and the
    ranking, so the hash pins the full artifact: every token, its id, and
    its frequency."""
    from arrowhouse_spark.operators.bpe import bpe_train_merges_batched

    _merges, enc = bpe_train_merges_batched(
        _t(spark, sf_dir, "documents"),
        n_merges=16,
        batch_size=8,
        return_encoded=True,
    )
    top = (
        enc.select(F.explode("bpe_tokens").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("tok").asc())
        .limit(256)
        # referenced twice (rank base + broadcast side) — cut so the
        # encoded-corpus explode + count + TakeOrdered run once
        .localCheckpoint(eager=False)
    )
    other = F.broadcast(
        top.select(F.col("tok").alias("tok2"), F.col("tf").alias("tf2"))
    )
    higher = (F.col("tf2") > F.col("tf")) | (
        (F.col("tf2") == F.col("tf")) & (F.col("tok2") < F.col("tok"))
    )
    return (
        top.join(other, higher, "left")
        .groupBy("tok", "tf")
        .agg((F.count(F.col("tok2")) + 1).cast("int").alias("tid"))
        .select("tok", "tid", F.col("tf").cast("long").alias("tf"))
    )


@register("bpe_encode_pretrained", _bpe_pretrained_oracle_sql(12, 4))
def bpe_encode_pretrained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train-once/encode-often split (operators/bpe.py:
    bpe_apply_merges): batched-BPE-train 12 merges (3 passes of top-4
    non-interfering pairs) on the EVEN documents, then encode the held-out
    ODD documents — text the trainer never saw — by broadcasting the merge
    table and applying it in training order with one map-side F.aggregate
    fold per document (no corpus shuffle at all; the 100 TB encode-job
    shape). The oracle replays the training passes AND the held-out
    application in SQL, so the hash pins the learned merges and every
    held-out document's full encoded sequence."""
    from arrowhouse_spark.operators.bpe import (
        bpe_apply_merges,
        bpe_train_merges_batched,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train_merges_batched(
        docs.filter(F.col("doc_id") % 2 == 0), n_merges=12, batch_size=4
    )
    held_out = docs.filter(F.col("doc_id") % 2 == 1)
    enc = bpe_apply_merges(held_out, merges)
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").cast("int").alias("n_bpe_tokens"),
        F.substring(F.md5(F.concat_ws(" ", "bpe_tokens")), 1, 16).alias(
            "bpe_checksum"
        ),
    )


@register("bpe_train_batched", _bpe_batched_oracle_sql(64, 8))
def bpe_train_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-form BPE training (operators/bpe.py:
    bpe_train_merges_batched — round-6 verdict #1): up to 64 merges in at
    most 8 corpus passes, each pass selecting the top-8 non-interfering
    pairs (no token shared with any higher-ranked pair) via keyed
    min-struct aggregation — no global window, no driver loop over
    merges — and applying the whole batch in ONE map-side F.aggregate
    fold over the 1-row broadcast merge array. The oracle unrolls all 8
    passes with the identical ranking, independence rule, and nested
    greedy replaces, so the hash pins every selected pair, its count,
    and the pass it was learned in."""
    from arrowhouse_spark.operators.bpe import bpe_train_merges_batched

    return bpe_train_merges_batched(
        _t(spark, sf_dir, "documents"), n_merges=64, batch_size=8
    )


@register("bpe_train_merges", _bpe_oracle_sql(5))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): the first 5
    merge rounds learned over the documents corpus — each round one
    map-side pair explode, one keyed count, a TakeOrdered(1), and a 1-row
    broadcast merge application, with the working corpus lineage-cut
    between rounds. The oracle replays all 5 rounds as unrolled SQL CTEs
    with the identical boundary-wrapped greedy replace, so the hash
    compare certifies the full iterative computation: a wrong count, a
    different tie-break, or a single mis-applied merge in ANY round
    cascades into different winners downstream and flips the hash."""
    from arrowhouse_spark.operators.bpe import bpe_train_merges as bpe

    return bpe(_t(spark, sf_dir, "documents"), n_merges=5)


@register(
    "quality_quantile_filter",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             len(list_filter(string_split(text, ' '), x -> x != ''))
               AS n_tokens,
             len(list_distinct(list_filter(string_split(text, ' '),
               x -> x != ''))) AS n_uniq
      FROM documents
    ), q AS (
      SELECT doc_id, source,
             round(least(n_tokens / 100.0, 1.0) *
                   round(n_uniq / greatest(n_tokens, 1), 6), 6) AS quality
      FROM t
    ), thr AS (
      SELECT source, round(quantile_cont(quality, 0.8), 6) AS q_thr
      FROM q GROUP BY source
    )
    SELECT q.doc_id, q.source, q.quality, thr.q_thr,
           q.quality >= thr.q_thr AS kept
    FROM q JOIN thr USING (source)
    """,
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-quantile selection
    (operators/text.py:quality_quantile_filter): each source keeps its
    top-20% quality slice. One keyed exact-percentile aggregation (the
    documented exact/approx trade) + broadcast threshold join; the hash
    pins per-source interpolated thresholds and every keep decision."""
    from arrowhouse_spark.operators.text import quality_quantile_filter as qqf

    return qqf(_t(spark, sf_dir, "documents"), frac=0.8).select(
        "doc_id", "source", "quality", "q_thr", "kept"
    )


@register(
    "dsir_importance_select",
    """
    WITH toks AS (
      SELECT doc_id,
             (('0x' || substr(md5(tok), 1, 8))::UBIGINT % 1024)::BIGINT AS bucket,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t
      FROM (SELECT doc_id, lang,
                   unnest(list_filter(string_split(coalesce(text, ''), ' '),
                                      x -> x != '')) AS tok
            FROM documents)
    ), counts AS (
      SELECT bucket, count(*) AS c_raw, sum(is_t) AS c_t
      FROM toks GROUP BY bucket
    ), tot AS (
      SELECT sum(c_raw) AS n_raw, sum(c_t) AS n_t FROM counts
    ), ratio AS (
      SELECT bucket,
             ln((c_t + 1.0) / (n_t + 1024.0))
               - ln((c_raw + 1.0) / (n_raw + 1024.0)) AS lr
      FROM counts, tot
    ), scored AS (
      SELECT t.doc_id, count(*) AS n_toks, round(sum(r.lr), 3) AS log_importance
      FROM toks t JOIN ratio r USING (bucket)
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(s.n_toks, 0) AS BIGINT) AS n_toks,
           coalesce(s.log_importance, 0.0) AS log_importance,
           coalesce(s.log_importance, 0.0) >= 0.0 AS kept
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting (operators/dsir.py, after Xie et al. 2023):
    score every doc by its hashed-unigram log importance against the
    English subset as the target domain (Laplace-smoothed 1024-bucket
    distributions), kept = more-target-like-than-pool (log w ≥ 0). The
    hashed feature space makes the model a fixed 1024-row broadcast at any
    corpus size — two keyed aggs + one keyed per-doc sum, no corpus-sized
    state. 3-decimal rounding is the doc_unigram_logprob libm convention;
    the oracle replays buckets, smoothing, and scores exactly."""
    from arrowhouse_spark.operators.dsir import dsir_importance

    docs = _t(spark, sf_dir, "documents")
    scored = dsir_importance(docs, target=F.col("lang") == "en")
    return scored.select(
        "doc_id",
        "n_toks",
        "log_importance",
        (F.col("log_importance") >= 0.0).alias("kept"),
    )


@register("bpe_encode_docs", _bpe_oracle_sql(3, encode=True))
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train→encode half of the tokenizer build
    (operators/bpe.py:bpe_train_merges with return_encoded=True): learn 3
    merges over the corpus, apply ALL of them, and emit per-document
    encoded stats (token count after merging + a 16-hex checksum of the
    space-joined BPE tokens). The checksum pins every document's full
    post-merge token sequence, so a single mis-applied or mis-ordered
    merge anywhere in the corpus flips the hash. Same plan per round as
    bpe_train_merges; the encode output is the training loop's final
    corpus state re-keyed by doc_id (no extra pass)."""
    from arrowhouse_spark.operators.bpe import bpe_train_merges as bpe

    _merges, encoded = bpe(
        _t(spark, sf_dir, "documents"), n_merges=3, return_encoded=True
    )
    return encoded.select(
        "doc_id",
        F.size("bpe_tokens").cast("int").alias("n_bpe_tokens"),
        F.substring(F.md5(F.concat_ws(" ", "bpe_tokens")), 1, 16).alias(
            "bpe_checksum"
        ),
    )


@register(
    "split_leakage_check",
    r"""
    WITH base AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 500000 AS doc_id, text
      FROM documents WHERE doc_id % 10 = 0
    ), fps AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
             (('0x' || substr(md5('split' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::UBIGINT % 1000)::BIGINT AS bucket
      FROM base
    ), tr AS (
      SELECT fp, CAST(count(*) AS BIGINT) AS n_train,
             min(doc_id) AS min_train_id
      FROM fps WHERE bucket >= 200 GROUP BY fp
    ), te AS (
      SELECT fp, CAST(count(*) AS BIGINT) AS n_test,
             min(doc_id) AS min_test_id
      FROM fps WHERE bucket < 200 GROUP BY fp
    )
    SELECT tr.fp, n_train, min_train_id, n_test, min_test_id
    FROM tr JOIN te USING (fp)
    """,
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split content-leakage audit
    (operators/sampling.py:split_leakage_check): an id-keyed 80/20 split
    is content-leaky when duplicate text lands on both sides — injected
    copies of every 10th doc (doc_id+500000, identical text) guarantee
    cross-split duplicates on both engines, and the output pins every
    leaked fingerprint with its per-side counts and min ids. Composes the
    md5-prefix split with the dedup fingerprint; all shuffles carry
    (fp, long, long) rows only."""
    from arrowhouse_spark.operators.sampling import split_leakage_check as slc

    docs = _t(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 500000).alias("doc_id"), "text"
        )
    )
    return slc(base, test_frac=0.2)


@register(
    "bm25_topk",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x != '')) AS term
      FROM documents
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1
    ), stats AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok
      WHERE term IN ('scan', 'merge', 'window') GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY 1
    ), contrib AS (
      SELECT tf.doc_id,
             ln((stats.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS c
      FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN stats
    ), scored AS (
      SELECT doc_id, round(sum(c), 6) AS score FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
             AS rank
    FROM scored ORDER BY score DESC, doc_id LIMIT 15
    """,
)
def bm25_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-15 for the 3-term query (scan, merge, window)
    (operators/text.py:bm25_topk) — the retrieval lookup over the corpus
    the inverted-index/tf-idf queries build. Inline terms compile to a
    map-side isin; the per-doc sum is one keyed agg; the top-k is a
    TakeOrdered, never a global sort. Rank ties break on the 6-dp-rounded
    score so both engines agree."""
    from arrowhouse_spark.operators.text import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"),
        ["scan", "merge", "window"],
        k=15,
    )


@register(
    "bpe_decode_roundtrip",
    """
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           array_to_string(toks, ' ') AS text
    FROM (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x != '') AS toks
      FROM documents WHERE doc_id % 2 = 1
    )
    WHERE len(toks) > 0
    """,
)
def bpe_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer round-trip proof (operators/bpe.py:bpe_decode): train 12
    batched merges on the EVEN documents, encode the held-out ODD
    documents, then DECODE them back. BPE merging is lossless, so the
    decoded stream must equal the original whitespace tokens exactly —
    the oracle is simply the untouched source text (no SQL BPE replay),
    which pins decode∘encode = identity per document, byte for byte.
    Train/encode shapes are the pretrained query's; decode adds zero
    shuffles (map-side split/flatten/join)."""
    from arrowhouse_spark.operators.bpe import (
        bpe_apply_merges,
        bpe_decode,
        bpe_train_merges_batched,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train_merges_batched(
        docs.filter(F.col("doc_id") % 2 == 0), n_merges=12, batch_size=4
    )
    enc = bpe_apply_merges(docs.filter(F.col("doc_id") % 2 == 1), merges)
    dec = bpe_decode(enc)
    return dec.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
        "text",
    )


@register(
    "doc_dedup_inner_lines",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), lns AS (
      SELECT doc_id,
             [array_to_string(w[i*10+1 : i*10+10], ' ')
              FOR i IN range(0, CAST(ceil(len(w)/10.0) AS BIGINT))] AS ls
      FROM toks
    ), aug AS (
      SELECT doc_id, list_concat(ls, ls[1:2]) AS l2 FROM lns
    ), lines AS (
      SELECT doc_id, unnest(ls2, recursive := true) FROM (
        SELECT doc_id,
               [{'pos': i - 1, 'line': l2[i]}
                FOR i IN range(1, len(l2) + 1)] AS ls2
        FROM aug
      )
    ), first AS (
      SELECT doc_id, line, min(pos) AS pos FROM lines GROUP BY 1, 2
    ), tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines
      FROM lines GROUP BY 1
    )
    SELECT f.doc_id, t.n_lines, CAST(count(*) AS BIGINT) AS n_kept,
           string_agg(f.line, ' ' ORDER BY f.pos) AS text
    FROM first f JOIN tot t USING (doc_id)
    GROUP BY f.doc_id, t.n_lines
    """,
)
def doc_dedup_inner_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repeated-line removal
    (operators/dedup.py:dedup_lines_within_doc — the intra-page half of
    the C4 §2.2 line filter; line_dedup_docs is the cross-document half).
    Documents are chunked into 10-token lines with copies of the first
    two lines INJECTED at the tail (guaranteeing within-doc repeats on
    both engines, the split_leakage convention); the operator keeps each
    line's first occurrence and reassembles in order. The oracle pins
    every rewritten text plus the per-doc kept/total counts."""
    from arrowhouse_spark.operators.dedup import dedup_lines_within_doc

    docs = _t(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(w) / F.lit(10.0)).cast("int")
    ls = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(F.slice(w, i * F.lit(10) + 1, 10), " "),
    )
    aug = F.concat(ls, F.slice(ls, 1, 2))
    lines = docs.select("doc_id", F.posexplode(aug).alias("pos", "line"))
    return dedup_lines_within_doc(lines, sep=" ")


@register(
    "events_hopping_window",
    """
    WITH e AS (
      SELECT event_type, value,
             unnest([date_trunc('hour', ts),
                     date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
      FROM events
    )
    SELECT event_type,
           strftime(ws, '%Y-%m-%d %H:%M:%S') AS win_start,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS sum_value
    FROM e GROUP BY 1, 2
    """,
)
def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window aggregation: 2-hour windows every 1 hour
    via Spark's native F.window — each event contributes to exactly two
    overlapping windows. The tumbling complement is events_hourly; the
    oracle replays the overlap by unnesting each event into its two
    hop-aligned window starts (hour-aligned windows coincide with Spark's
    epoch-aligned assignment). Window assignment is a map-side generator —
    the only shuffle is the keyed aggregation, same as any groupBy."""
    return (
        _events(spark, sf_dir)
        .groupBy(
            "event_type",
            F.window("ts", "2 hours", "1 hour").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "event_type",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "n",
            "sum_value",
        )
    )


def _edit_distance_oracle(
    num_hashes: int = 16, bands: int = 8, max_dist: int = 120
) -> str:
    """LSH-blocked exact-Levenshtein oracle: the bit-exact banding prefix
    (same machinery as minhash_lsh_parity) proposes candidates; DuckDB's
    levenshtein() — classic unit-cost edit distance, identical semantics
    to Spark's — verifies."""
    prefix, _eq = _minhash_sigs_prefix(num_hashes, bands)
    return f"""{prefix},
    pairs AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id
    )
    SELECT p.id_a, p.id_b,
           CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist
    FROM pairs p
    JOIN documents a ON a.doc_id = p.id_a
    JOIN documents b ON b.doc_id = p.id_b
    WHERE levenshtein(a.text, b.text) <= {max_dist}
    """


@register("edit_distance_pairs", _edit_distance_oracle(16, 8, 120))
def edit_distance_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-duplicate pairs by EXACT edit distance, LSH-blocked
    (operators/dedup.py:edit_distance_pairs): 16-hash/8-band minhash
    banding proposes ~1k candidates (never all-pairs), then Spark's
    builtin banded Levenshtein (threshold form, O(max_dist·len) per pair)
    keeps pairs within 120 edits. The oracle replays the full signature/
    band/bucket chain bit-for-bit (minhash_lsh_parity machinery) and
    verifies with DuckDB's levenshtein — pinning both the blocking and
    the metric."""
    from arrowhouse_spark.operators.dedup import (
        edit_distance_pairs,
        minhash_lsh_candidates,
        minhash_signature,
    )

    docs = _t(spark, sf_dir, "documents")
    sig = minhash_signature(
        docs,
        num_hashes=16,
        shingle_n=2,
        shingles=_doc_shingles_guarded(spark, sf_dir, 2),
    )
    cands = minhash_lsh_candidates(sig, num_hashes=16, bands=8)
    return edit_distance_pairs(docs, cands, max_dist=120)


@register(
    "weighted_sample_docs",
    """
    WITH d AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x != ''))
               AS INTEGER) AS n_tokens,
             (('0x' || substr(md5('ws' || CAST(doc_id AS VARCHAR)), 1, 8))
               ::UBIGINT + 1) / 4294967296.0 AS u
      FROM documents
    )
    SELECT doc_id, n_tokens, round(ln(u) / n_tokens, 9) AS race_key
    FROM d WHERE n_tokens > 0
    ORDER BY race_key DESC, doc_id LIMIT 25
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (operators/sampling.py:weighted_sample — Efraimidis-Spirakis A-ES):
    25 docs drawn with probability proportional to token count via the
    md5-uniform exponential race. The oracle replays the uniform, the
    race key, and the top-k selection; the 9-dp-rounded key is both the
    output column and the sort key so selection and ordering are pinned
    cross-engine."""
    from arrowhouse_spark.operators.sampling import weighted_sample
    from arrowhouse_spark.operators.text import token_count

    docs = token_count(_t(spark, sf_dir, "documents"))
    return weighted_sample(docs, "n_tokens", k=25).select(
        "doc_id", "n_tokens", "race_key"
    )


@register(
    "histogram_equidepth",
    """
    WITH edges AS (
      SELECT list_transform(
               quantile_cont(o_totalprice,
                 [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]),
               e -> round(e, 6)) AS es
      FROM orders
    )
    SELECT len(list_filter(es, e -> o_totalprice > e)) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi
    FROM orders, edges
    GROUP BY 1
    """,
)
def histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH histogram (8 bins of ~equal row count) — the form query
    optimizers and data profilers actually keep, complementing the
    fixed-width histogram_totalprice. Bin edges are the interpolated
    7-quantile array computed in ONE 1-row aggregate and broadcast; bin
    assignment is a map-side count of edges below the value (no ntile —
    that is a global window, the single-task shape the plan audit
    forbids). Both engines round edges to 6 dp before assignment so
    boundary rows bin identically."""
    from arrowhouse_spark.session import shuffle_parts

    # project to the one needed column and repartition ONCE, shared by
    # both legs through ReusedExchange: exact percentile's per-row buffer
    # insert is the query's CPU and ran fused into the single-split scan
    # (one task built the whole 150k-value buffer serially), and the
    # binning leg re-scanned the file
    o = _t(spark, sf_dir, "orders").select("o_totalprice")
    # KEYLESS repartition (round-13 ADVICE): neither consumer — the global
    # percentile aggregate nor the map-side binning — needs key
    # clustering, and hashing on the VALUE column sends duplicate-heavy
    # prices to the same partition, re-creating the very skew the spread
    # exists to remove. Round-robin gives an even spread regardless of
    # value duplication; the shared exchange (ReusedExchange) is unchanged.
    o = o.repartition(shuffle_parts(spark))
    edges = o.agg(
        F.array(
            *[
                F.round(
                    F.percentile("o_totalprice", F.lit(i / 8.0)), 6
                )
                for i in range(1, 8)
            ]
        ).alias("es")
    )
    return (
        o.crossJoin(F.broadcast(edges))
        .withColumn(
            "bin",
            F.size(
                F.filter(F.col("es"), lambda e: F.col("o_totalprice") > e)
            ),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


