"""Property-based differential tests (hypothesis) against independent
oracles: DuckDB for the SSA program compiler's group-by/filter semantics,
pandas.merge_asof for the as-of join, and a pure-python reference model for
sessionization. These complement the fixed-shape tests the reference uses
(SURVEY.md §5: closed-form expected results only — no property tests there;
this is the stronger harness the driver's DuckDB gate suggests).

Examples are kept small (tiny tables, ≤15 examples) because every example
runs Spark jobs; the value is in the random *shapes* — null keys, empty
groups, ties, unmatched keys — not volume.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from arrowhouse_spark.compile import apply_program
from arrowhouse_spark.operators.asof import asof_join
from arrowhouse_spark.operators.sessions import sessionize
from arrowhouse_spark.program import AggOp, AggregateAssign, GroupBy, Program, ProgramStep

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 4)),       # group key (nullable)
        st.one_of(st.none(), st.integers(-100, 100)),  # value (nullable)
    ),
    min_size=0,
    max_size=50,
)


pytestmark = pytest.mark.slow  # full tier: streaming/property/e2e (see pytest.ini)


@_SETTINGS
@given(rows=_ROWS)
def test_groupby_program_matches_duckdb(spark, rows):
    schema = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.IntegerType())]
    )
    df = spark.createDataFrame(rows, schema)
    prog = Program(
        steps=(
            ProgramStep(
                group_by=GroupBy(
                    keys=("k",),
                    aggregates=(
                        AggregateAssign("s", AggOp.SUM, "v"),
                        AggregateAssign("mn", AggOp.MIN, "v"),
                        AggregateAssign("mx", AggOp.MAX, "v"),
                        AggregateAssign("c", AggOp.COUNT, "v"),
                        AggregateAssign("n", AggOp.COUNT),
                    ),
                )
            ),
        )
    )
    got = {
        r["k"]: (r["s"], r["mn"], r["mx"], r["c"], r["n"])
        for r in apply_program(df, prog).collect()
    }

    pdf = pd.DataFrame(rows, columns=["k", "v"], dtype="object")
    con = duckdb.connect()
    con.register("t", pdf)
    exp = {
        r[0]: (r[1], r[2], r[3], r[4], r[5])
        for r in con.execute(
            "SELECT k, CAST(sum(v) AS BIGINT), min(v), max(v), count(v), count(*) "
            "FROM t GROUP BY k"
        ).fetchall()
    }
    assert got == exp


@_SETTINGS
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(-9, 9)),
        min_size=0,
        max_size=25,
    ),
    direction=st.sampled_from(["backward", "forward"]),
    exact=st.booleans(),
)
def test_asof_join_matches_pandas_merge_asof(spark, left, right, direction, exact):
    # dedupe right on (key, ts): with duplicates the "latest" row is
    # order-dependent in both engines and the comparison would be ambiguous
    right = list({(k, t): (k, t, v) for k, t, v in right}.values())
    if not left:
        return
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "rid: long, k: int, ts: int"
    )
    rdf = spark.createDataFrame(right, "k: int, ts: int, v: int") if right else (
        spark.createDataFrame([], "k: int, ts: int, v: int")
    )
    out = asof_join(
        ldf, rdf, on="ts", by=["k"], value_cols=["v"],
        direction=direction, allow_exact_matches=exact,
    )
    got = {r.rid: r.asof_v for r in out.collect()}

    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], columns=["rid", "k", "ts"]
    ).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(right, columns=["k", "ts", "v"])
        .astype({"k": "int64", "ts": "int64", "v": "int64"})
        .sort_values("ts", kind="stable")
    )
    exp_df = pd.merge_asof(
        lp, rp, on="ts", by="k", direction=direction, allow_exact_matches=exact
    )
    exp = {
        int(r.rid): (None if pd.isna(r.v) else int(r.v))
        for r in exp_df.itertuples()
    }
    assert got == exp


@_SETTINGS
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 1000)), min_size=0, max_size=40
    ),
    gap=st.integers(1, 200),
)
def test_sessionize_matches_python_model(spark, events, gap):
    # dedupe (key, ts): equal timestamps make session order ambiguous
    events = list({(k, t) for k, t in events})
    df = spark.createDataFrame(events, "k: int, ts: int") if events else (
        spark.createDataFrame([], "k: int, ts: int")
    )
    out = sessionize(df, "ts", ["k"], gap_seconds=gap)
    got = {(r.k, r.ts): r.session_id for r in out.collect()}

    exp: dict[tuple[int, int], int] = {}
    by_key: dict[int, list[int]] = {}
    for k, t in sorted(events):
        by_key.setdefault(k, []).append(t)
    for k, ts_list in by_key.items():
        sid = -1
        prev = None
        for t in sorted(ts_list):
            if prev is None or t - prev > gap:
                sid += 1
            exp[(k, t)] = sid
            prev = t
    assert got == exp


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-1000, 1000)),
            st.one_of(st.none(), st.integers(-1000, 1000)),
        ),
        min_size=0,
        max_size=40,
    ),
    threshold=st.integers(-500, 500),
)
def test_scalar_program_matches_duckdb(spark, rows, threshold):
    from arrowhouse_spark.program import Assign, Op, const

    schema = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.IntegerType())]
    )
    df = spark.createDataFrame(rows, schema)
    prog = Program(
        steps=(
            ProgramStep(
                assignes=(
                    const("thr", threshold),
                    Assign("c", Op.ADD, ("a", "b")),
                    Assign("d", Op.ABS, ("b",)),
                    Assign("e", Op.NEGATE, ("a",)),
                    Assign("keep", Op.LESS, ("a", "thr")),
                ),
                filters=("keep",),
                projection=("a", "b", "c", "d", "e"),
            ),
        )
    )
    # None-safe sort key: tuples may mix ints and NULLs, and Python can't
    # order int vs None directly.
    none_safe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    got = sorted(
        (
            (r["a"], r["b"], r["c"], r["d"], r["e"])
            for r in apply_program(df, prog).collect()
        ),
        key=none_safe,
    )

    pdf = pd.DataFrame(rows, columns=["a", "b"], dtype="object")
    con = duckdb.connect()
    con.register("t", pdf)
    exp = sorted(
        con.execute(
            f"SELECT a, b, a + b AS c, abs(b) AS d, -a AS e FROM t WHERE a < {threshold}"
        ).fetchall(),
        key=none_safe,
    )
    assert got == exp


@_SETTINGS
@given(
    src1=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3), st.integers(0, 99)),
        min_size=0,
        max_size=20,
    ),
    src2=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 3), st.integers(100, 199)),
        min_size=0,
        max_size=20,
    ),
)
def test_replace_merge_matches_python_model(spark, src1, src2):
    """Replace-merge keeps the FIRST row per key in (sort_keys, source order,
    in-source position) order ≡ MergingSortedInputStream Replace mode with
    SortCursor source-order tie-break (SURVEY.md §7 'What's hard' #3).
    Rows are (key, version, payload); sort by version DESC → keep the
    highest version, ties broken by earlier source then earlier row."""
    from arrowhouse_spark.operators.merge import replace_merge
    from arrowhouse_spark.operators.sort import SortKey

    if not src1 and not src2:
        return
    schema = "k: int, ver: int, payload: int"
    dfs = []
    if src1:
        dfs.append(spark.createDataFrame(src1, schema).coalesce(1))
    if src2:
        dfs.append(spark.createDataFrame(src2, schema).coalesce(1))
    out = replace_merge(dfs, ["k"], [SortKey("ver", ascending=False)])
    got = {r.k: (r.ver, r.payload) for r in out.collect()}

    exp: dict[int, tuple[int, int]] = {}
    best: dict[int, tuple] = {}
    for src_i, rows in enumerate([src1, src2]):
        for pos, (k, ver, payload) in enumerate(rows):
            cand = (-ver, src_i, pos)  # first in (ver DESC, src, pos) order
            if k not in best or cand < best[k]:
                best[k] = cand
                exp[k] = (ver, payload)
    assert got == exp


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 2),
            st.one_of(st.none(), st.integers(0, 30)),
        ),
        min_size=0,
        max_size=60,
    ),
    salt=st.integers(1, 8),
)
def test_salted_count_distinct_is_exact(spark, rows, salt):
    from arrowhouse_spark.operators.skew import salted_count_distinct

    df = spark.createDataFrame(rows, "k: int, v: int") if rows else (
        spark.createDataFrame([], "k: int, v: int")
    )
    got = {
        r.k: r.n_distinct
        for r in salted_count_distinct(df, ["k"], "v", salt=salt).collect()
    }
    exp: dict[int, set] = {}
    for k, v in rows:
        if v is not None:
            exp.setdefault(k, set()).add(v)
    assert got == {k: len(s) for k, s in exp.items()}


# --- exact n-gram Jaccard: dense vs sparse vs pure-python reference ----------

_CORPUS = st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=0, max_size=10),
    min_size=0,
    max_size=8,
)


def _py_jaccard_pairs(docs: list[list[str]], n: int, threshold: float):
    """Independent reference: brute-force all-pairs exact Jaccard over
    distinct word n-grams."""
    import itertools

    shingles = {
        i: {" ".join(w[j : j + n]) for j in range(len(w) - n + 1)}
        for i, w in enumerate(docs)
    }
    out = set()
    for a, b in itertools.combinations(sorted(shingles), 2):
        sa, sb = shingles[a], shingles[b]
        if not sa and not sb:
            continue
        inter = len(sa & sb)
        if inter == 0:
            continue  # operator only emits pairs sharing >=1 shingle
        j = round(inter / (len(sa) + len(sb) - inter), 6)
        if j >= threshold:
            out.add((a, b, j))
    return out


@_SETTINGS
@given(corpus=_CORPUS)
@pytest.mark.parametrize("dense_cap", [1 << 27, 1])  # force dense and sparse paths
def test_ngram_jaccard_matches_bruteforce(spark, corpus, dense_cap):
    from arrowhouse_spark.operators.dedup import ngram_jaccard_pairs

    docs = [(i, " ".join(w)) for i, w in enumerate(corpus)]
    if not docs:
        return
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in ngram_jaccard_pairs(
            df, shingle_n=2, threshold=0.3, dense_cells_cap=dense_cap
        ).collect()
    }
    assert got == _py_jaccard_pairs(corpus, 2, 0.3)


# --- Gopher quality signals vs pure-python reference -------------------------

_TEXTS = st.lists(
    st.text(
        alphabet=" abcdefgh#!.123",
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=6,
)


@_SETTINGS
@given(texts=_TEXTS)
def test_gopher_signals_match_python(spark, texts):
    from arrowhouse_spark.operators.text import gopher_quality

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_quality(df).collect()}
    for i, t in enumerate(texts):
        w = [x for x in t.split(" ") if x != ""]
        n = len(w)
        r = rows[i]
        assert r.n_words == n
        assert r.mean_word_len == round((len(t) - (n - 1)) / max(n, 1), 6)
        assert r.alpha_word_ratio == round(
            sum(1 for x in w if any(c.isalpha() for c in x)) / max(n, 1), 6
        )
        assert r.symbol_ratio == round(
            sum(1 for c in t if not (c.isalnum() or c == " ")) / max(len(t), 1), 6
        )
        assert r.dup_word_frac == round(1.0 - len(set(w)) / max(n, 1), 6)
        bgs = [" ".join(w[j : j + 2]) for j in range(n - 1)]
        expect_top = (
            round(max(bgs.count(g) for g in set(bgs)) / len(bgs), 6) if bgs else 0.0
        )
        assert r.top_bigram_frac == expect_top


# ---------------------------------------------------------------------------
# Round-4 operators vs pure-python reference models
# ---------------------------------------------------------------------------

_DOC_SIZES = st.lists(st.integers(1, 40), min_size=1, max_size=30)


@_SETTINGS
@given(sizes=_DOC_SIZES, budget=st.integers(5, 60))
def test_pack_sequences_matches_python_model(spark, sizes, budget):
    """pack_id/pack_off must equal the sequential FFD-order model inside
    each bucket, and the pack partition must cover every doc exactly once."""
    from arrowhouse_spark.operators.packing import pack_sequences

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r.doc_id: (r.bucket, r.pack_id, r.pack_off, r.n_tokens)
        for r in pack_sequences(df, budget=budget, n_buckets=4).collect()
    }
    assert len(got) == len(sizes)
    # python model: same bucket rule (md5 prefix), same order, same cuts
    import hashlib

    def bucket(i):
        return int(hashlib.md5(f"pack{i}".encode()).hexdigest()[:8], 16) % 4

    by_bucket: dict[int, list[tuple[int, int]]] = {}
    for i, n in enumerate(sizes):
        by_bucket.setdefault(bucket(i), []).append((n, i))
    for b, docs in by_bucket.items():
        cum = 0
        for n, i in sorted(docs, key=lambda t: (-t[0], t[1])):
            assert got[i] == (b, cum // budget, cum % budget, n), (i, n, b)
            cum += n


@_SETTINGS
@given(
    docs=st.lists(
        st.lists(st.integers(0, 6), min_size=1, max_size=8),  # token ids
        min_size=1,
        max_size=12,
    ),
    max_df=st.integers(1, 4),
)
def test_line_dedup_matches_python_model(spark, docs, max_df):
    """Token-granularity line_dedup vs a direct python model: survivors,
    per-doc order, and counts all agree."""
    from arrowhouse_spark.operators.dedup import line_dedup

    rows = [(i, " ".join(f"t{t}" for t in toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r.doc_id: (r.text, r.n_lines_kept)
        for r in line_dedup(df, sep=" ", max_df=max_df).collect()
    }
    from collections import Counter

    dfc = Counter()
    for toks in docs:
        for t in set(toks):
            dfc[t] += 1
    for i, toks in enumerate(docs):
        kept = [t for t in toks if dfc[t] <= max_df]
        if kept:
            assert got[i] == (" ".join(f"t{t}" for t in kept), len(kept)), i
        else:
            assert i not in got


# --- dup_spans (ExactSubstr-approx) vs pure-python reference -----------------


def _py_dup_spans(docs: list[list[str]], w: int, min_count: int):
    """Independent reference: exact window counts + brute-force position-set
    coverage (the operator merges intervals with an F.aggregate fold)."""
    from collections import Counter

    wins = {
        i: [" ".join(t[j : j + w]) for j in range(len(t) - w + 1)]
        for i, t in enumerate(docs)
    }
    cnt = Counter(x for ws in wins.values() for x in ws)
    out = {}
    for i, t in enumerate(docs):
        dup_pos = [p for p, win in enumerate(wins[i]) if cnt[win] >= min_count]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + w))
        n = len(t)
        out[i] = (
            n,
            max(n - w + 1, 0),
            len(dup_pos),
            round(len(covered) / max(n, 1), 6),
        )
    return out


@_SETTINGS
@given(corpus=_CORPUS)
def test_dup_spans_matches_python_model(spark, corpus):
    from arrowhouse_spark.operators.dedup import dup_spans

    docs = [(i, " ".join(t)) for i, t in enumerate(corpus)]
    if not docs:
        return
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_windows, r.n_dup_windows, r.dup_token_frac)
        for r in dup_spans(df, window=3, min_count=2).collect()
    }
    assert got == _py_dup_spans(corpus, 3, 2)


def _bpe_batched_model(docs: list[tuple[int, str]], n_merges: int, k: int):
    """Pure-python reference for bpe_train_merges_batched: per pass, count
    adjacent pairs over all docs' token lists, rank by (count desc, pair),
    select pairs whose tokens appear in NO higher-ranked pair, cap at k,
    apply all selected greedily left-to-right per doc. Returns
    (merges, encoded): merges = [(pass, left, right, count)], encoded =
    {doc_id: tokens}."""
    from collections import Counter

    toks = {i: t.split() for i, t in docs}
    toks = {i: [w for w in t if w] for i, t in toks.items()}
    toks = {i: t for i, t in toks.items() if t}
    merges = []
    n_passes = -(-n_merges // k)
    for p in range(1, n_passes + 1):
        kk = min(k, n_merges - k * (p - 1))
        cnt = Counter()
        for t in toks.values():
            for a, b in zip(t, t[1:]):
                cnt[(a, b)] += 1
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        best_rank: dict[str, int] = {}
        for r, ((a, b), _c) in enumerate(ranked):
            for t in (a, b):
                best_rank.setdefault(t, r)
        selected = [
            (a, b, c)
            for r, ((a, b), c) in enumerate(ranked)
            if best_rank[a] == r and best_rank[b] == r
        ][:kk]
        for a, b, c in selected:
            merges.append((p, a, b, c))
        for i, t in toks.items():
            for a, b, _c in selected:
                out = []
                j = 0
                while j < len(t):
                    if j + 1 < len(t) and t[j] == a and t[j + 1] == b:
                        out.append(a + "+" + b)
                        j += 2
                    else:
                        out.append(t[j])
                        j += 1
                t = out
            toks[i] = t
    return merges, toks


_BPE_TOKENS = st.lists(
    st.sampled_from(["a", "b", "c", "ab", "x"]), min_size=0, max_size=12
)
_BPE_CORPUS = st.lists(_BPE_TOKENS, min_size=1, max_size=8)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_BPE_CORPUS, n_merges=st.integers(1, 6), k=st.integers(1, 3))
def test_bpe_batched_matches_python_model(spark, corpus, n_merges, k):
    """Differential for the batched BPE trainer: tiny random corpora over a
    5-token alphabet hammer the edge shapes the fixture oracle can't —
    empty docs, single-token docs, self-pairs (a,a) runs, merge-token
    collisions ('ab' vs a+b display), exhaustion mid-pass, k larger than
    the eligible set."""
    from arrowhouse_spark.operators.bpe import bpe_train_merges_batched

    docs = [(i, " ".join(t)) for i, t in enumerate(corpus)]
    want_merges, want_toks = _bpe_batched_model(docs, n_merges, k)

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    m, enc = bpe_train_merges_batched(
        df, n_merges=n_merges, batch_size=k, return_encoded=True
    )
    got_merges = sorted(
        (r["pass"], r.left_tok, r.right_tok, r.pair_count) for r in m.collect()
    )
    assert got_merges == sorted(want_merges)
    got_toks = {r.doc_id: r.bpe_tokens for r in enc.collect()}
    assert got_toks == want_toks


# --- DSIR importance vs a pure-python model -------------------------------

_DSIR_DOCS = st.lists(
    st.tuples(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=0, max_size=6),
        st.booleans(),  # is-target
    ),
    min_size=1,
    max_size=12,
)


@_SETTINGS
@given(_DSIR_DOCS)
def test_dsir_importance_matches_python_model(spark, docs):
    """dsir_importance ≡ an independent pure-python reimplementation of the
    hashed-unigram log-ratio (same md5 bucketing, same Laplace smoothing),
    to 3 decimals — independent of the DuckDB oracle's SQL replay."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from arrowhouse_spark.operators.dsir import dsir_importance

    n_buckets = 16
    rows = [(i, " ".join(toks), t) for i, (toks, t) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    got = {
        r.doc_id: (r.n_toks, r.log_importance)
        for r in dsir_importance(
            df, target=F.col("t"), n_buckets=n_buckets
        ).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets

    c_raw, c_t = {}, {}
    for toks, is_t in docs:
        for tok in toks:
            b = bucket(tok)
            c_raw[b] = c_raw.get(b, 0) + 1
            if is_t:
                c_t[b] = c_t.get(b, 0) + 1
    n_raw, n_t = sum(c_raw.values()), sum(c_t.values())
    for i, (toks, _is_t) in enumerate(docs):
        lw = sum(
            math.log((c_t.get(bucket(tok), 0) + 1.0) / (n_t + n_buckets))
            - math.log((c_raw[bucket(tok)] + 1.0) / (n_raw + n_buckets))
            for tok in toks
        )
        assert got[i][0] == len(toks)
        assert abs(got[i][1] - round(lw, 3)) < 1e-9, (i, got[i], lw)


# --- temperature mixing plan vs a pure-python model -----------------------

_TMIX_COUNTS = st.lists(st.integers(1, 40), min_size=1, max_size=6)


@_SETTINGS
@given(_TMIX_COUNTS, st.sampled_from([0.0, 0.5, 0.7, 1.0]))
def test_temperature_plan_matches_python_model(spark, counts, alpha):
    import math

    from arrowhouse_spark.operators.sampling import temperature_mixing_plan

    rows = [
        (j, f"s{i}") for i, n in enumerate(counts) for j in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    total = 50
    got = {
        r.source: r.take_n
        for r in temperature_mixing_plan(
            df, alpha=alpha, total=total, source_col="source"
        ).collect()
    }
    tot = sum(n**alpha for n in counts)
    for i, n in enumerate(counts):
        want = min(math.floor(round(total * (n**alpha) / tot, 6)), n)
        assert got[f"s{i}"] == want, (i, n, alpha, got)


# --- BPE decode round-trip property ---------------------------------------


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_BPE_CORPUS, n_merges=st.integers(1, 6), k=st.integers(1, 3))
def test_bpe_decode_inverts_encode_property(spark, corpus, n_merges, k):
    """decode∘encode = identity for EVERY corpus/merge-budget shape —
    empty docs (dropped by encode, by contract), single-token docs,
    self-pair runs, exhausted merges. Stricter than the fixture oracle:
    the identity must hold for arbitrary trained merge tables."""
    from arrowhouse_spark.operators.bpe import (
        bpe_decode,
        bpe_train_merges_batched,
    )

    docs = [(i, " ".join(t)) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    _m, enc = bpe_train_merges_batched(
        df, n_merges=n_merges, batch_size=k, return_encoded=True
    )
    got = {r.doc_id: r.text for r in bpe_decode(enc).collect()}
    want = {i: " ".join(t) for i, t in docs_nonempty(docs)}
    assert got == want


def docs_nonempty(docs):
    for i, text in docs:
        toks = [t for t in text.split(" ") if t]
        if toks:
            yield i, toks


# --- BM25 vs a pure-python model ------------------------------------------

_BM25_CORPUS = st.lists(
    st.lists(
        st.sampled_from(["q1", "q2", "w", "x", "y"]), min_size=1, max_size=8
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_BM25_CORPUS)
def test_bm25_matches_python_model(spark, corpus):
    """bm25_topk ≡ an independent python Okapi BM25 (+1-smoothed idf):
    random tiny corpora exercise all-docs-hit, no-docs-hit, tf ties and
    rank tie-breaks. k ≥ n_docs so the comparison covers the full scored
    set, not a cutoff."""
    import math

    from arrowhouse_spark.operators.text import bm25_topk

    terms = ["q1", "q2"]
    k1, b = 1.2, 0.75
    docs = [(i, " ".join(t)) for i, t in enumerate(corpus)]
    dls = {i: len(t) for i, t in enumerate(corpus)}
    n = len(corpus)
    avgdl = sum(dls.values()) / n
    dfreq = {
        q: sum(1 for t in corpus if q in t) for q in terms
    }
    want = {}
    for i, t in enumerate(corpus):
        s = 0.0
        hit = False
        for q in terms:
            tf = t.count(q)
            if tf == 0:
                continue
            hit = True
            idf = math.log((n - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
        if hit:
            want[i] = s

    rows = bm25_topk(
        spark.createDataFrame(docs, ["doc_id", "text"]), terms, k=len(docs) + 5
    ).collect()
    got = {r.doc_id: (r.score, r.rank) for r in rows}
    assert set(got) == set(want)
    for i, w in want.items():
        assert got[i][0] == pytest.approx(w, abs=1.5e-6)
    # ranks = exact sort order by (rounded score desc, doc_id asc)
    order = sorted(got, key=lambda i: (-got[i][0], i))
    assert [got[i][1] for i in order] == list(range(1, len(order) + 1))


_SKETCH_ROWS = st.lists(
    st.tuples(
        st.integers(0, 3),          # arbitrary split key (the "day")
        st.integers(0, 10**12),     # item id
    ),
    min_size=1,
    max_size=60,
)


@_SETTINGS
@given(rows=_SKETCH_ROWS)
def test_cms_merge_is_split_invariant_and_never_underestimates(spark, rows):
    # CM-sketch property: ANY partitioning of the stream, folded, equals
    # the direct sketch counter-for-counter (sum associativity), and every
    # point estimate upper-bounds the true count
    from collections import Counter

    from arrowhouse_spark.operators.aggstate import (
        cms_merge,
        cms_point_estimate,
        cms_state,
    )

    df = spark.createDataFrame(rows, "day int, u long")
    merged = cms_merge(cms_state(df, keys=["day"], value_col="u"), keys=[])
    direct = cms_state(df, keys=[], value_col="u")
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    truth = Counter(u for _, u in rows)
    probes = spark.createDataFrame(
        [(u,) for u in list(truth)[:8]], "u long"
    )
    est = {
        r["u"]: r["est"]
        for r in cms_point_estimate(merged, probes, "u").collect()
    }
    for u, n in list(truth.items())[:8]:
        assert est[u] >= n


@_SETTINGS
@given(rows=_SKETCH_ROWS)
def test_hist_merge_split_invariant_and_quantile_error_bound(spark, rows):
    # histogram property: split-then-merge ≡ direct, and the estimate sits
    # within one bin width of the q-th ORDER STATISTIC (ceil(q*n)-th value
    # — the guarantee the bin grid actually gives; a two-point midpoint
    # median interpolates BETWEEN order statistics, which no histogram
    # can see)
    import math

    from arrowhouse_spark.operators.aggstate import (
        hist_merge,
        hist_quantile,
        hist_state,
    )

    vals = [(day, float(u % 1000)) for day, u in rows]
    df = spark.createDataFrame(vals, "day int, v double")
    merged = hist_merge(
        hist_state(df, keys=["day"], value_col="v", bins=50, lo=0.0, hi=1000.0),
        keys=[],
    )
    direct = hist_state(df, keys=[], value_col="v", bins=50, lo=0.0, hi=1000.0)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
    est = {
        r["q"]: r["est"]
        for r in hist_quantile(
            merged, [0.5], bins=50, lo=0.0, hi=1000.0
        ).collect()
    }
    order_stat = sorted(v for _, v in vals)[
        max(0, math.ceil(0.5 * len(vals)) - 1)
    ]
    assert abs(est[0.5] - order_stat) <= 20.0 + 1e-9  # one bin width


@given(
    avails=st.lists(st.integers(1, 500), min_size=1, max_size=8),
    frac=st.sampled_from([0.25, 0.5, 0.9, 1.5]),
)
@_SETTINGS
def test_waterfill_conservation_and_caps(spark, avails, frac):
    """Waterfilling invariants for any availability profile: (1) total
    allocation equals min(budget, total availability) exactly (budget
    conservation / full-take), (2) 0 < rate <= 1, (3) alloc never exceeds
    avail, (4) every uncapped source gets the SAME allocation (the
    waterline), which is >= every capped source's availability."""
    from arrowhouse_spark.operators.sampling import waterfill_allocation

    av = spark.createDataFrame(
        [(f"s{i}", a) for i, a in enumerate(avails)], "src string, n long"
    )
    budget = frac * sum(avails)
    rows = waterfill_allocation(av, "src", "n", budget=budget).collect()
    total_alloc = sum(r.alloc for r in rows)
    # each alloc is rounded to 4dp in the output: the sum may drift by up
    # to 5e-5 per source from the exactly-conserved pre-rounding total
    assert abs(total_alloc - min(budget, sum(avails))) <= (
        5e-5 * len(avails) + 1e-9
    )
    for r in rows:
        assert 0.0 < r.rate <= 1.0 + 1e-12
        assert r.alloc <= r.avail + 1e-9
        assert r.capped == (r.alloc >= r.avail - 1e-9)
    unc = {r.alloc for r in rows if not r.capped}
    assert len(unc) <= 1  # all uncapped sources share the waterline
    if unc:
        line = next(iter(unc))
        assert all(r.avail <= line + 1e-9 for r in rows if r.capped)


def test_waterfill_duplicate_availability_conserves_budget(spark):
    """Regression (round-13 driver counterexample class): DUPLICATED
    availability values must each contribute ONE candidate waterline.
    Before the distinct() in waterfill_allocation, avails [2,2,3] with
    budget 6.3 grouped the θ=2 candidate over both duplicate rows,
    doubling alloc(2) to 12 > 6.3, excluding every candidate (θ_lo=0)
    and allocating only 6.1 — a 0.2 conservation breach."""
    from arrowhouse_spark.operators.sampling import waterfill_allocation

    av = spark.createDataFrame(
        [("s0", 2), ("s1", 2), ("s2", 3)], "src string, n long"
    )
    rows = waterfill_allocation(av, "src", "n", budget=6.3).collect()
    total = sum(r.alloc for r in rows)
    assert abs(total - 6.3) <= 5e-5 * 3 + 1e-9
    got = {r.src: r.alloc for r in rows}
    assert got == {"s0": 2.0, "s1": 2.0, "s2": 2.3}


@given(
    seqs=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 60)),
        min_size=1, max_size=80, unique=True,
    )
)
@_SETTINGS
def test_gaps_islands_matches_python_model(spark, seqs):
    from arrowhouse_spark.operators.intervals import gaps_islands

    df = spark.createDataFrame(list(seqs), "k int, seq long")
    got = {
        (r.k, r.st_start, r.st_end, r.st_len)
        for r in gaps_islands(df, ["k"], "seq", out_prefix="st").collect()
    }
    want = set()
    from collections import defaultdict

    by = defaultdict(list)
    for k, s in seqs:
        by[k].append(s)
    for k, vals in by.items():
        vals.sort()
        start = prev = vals[0]
        for v in vals[1:]:
            if v == prev + 1:
                prev = v
                continue
            want.add((k, start, prev, prev - start + 1))
            start = prev = v
        want.add((k, start, prev, prev - start + 1))
    assert got == want
