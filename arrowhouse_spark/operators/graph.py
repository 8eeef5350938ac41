"""Iterative graph scoring over relation-shaped edge lists — PageRank.

Complements operators/components.py (connected components): components
answers "which vertices belong together" (dedup clustering), PageRank
answers "which vertices matter" — the standard centrality prior for
web-corpus curation (rank-weighted sampling of crawled pages, seed-list
scoring, link-spam damping). Reference scope note: the reference engine
(ArrowHouse) has no graph operators; this is extension surface, built
from the same join/groupBy primitives as components.py per SURVEY.md §2's
"custom operators as compositions" doctrine.

Algorithm: classic power iteration with damping (Brin & Page 1998).
rank_i+1(v) = (1-d)/N + d * (Σ_{u→v} rank_i(u)/outdeg(u) + dangling_i/N)
where dangling_i is the total rank mass on vertices with no out-edges,
redistributed uniformly (the standard stochastic-matrix completion).

Scale notes (100 TB doctrine):
- Each iteration is TWO keyed shuffles: edges⋈ranks on src (a co-located
  join when both sides are pre-partitioned by src — edges are static, so
  at scale they are shuffled ONCE and reused), and the per-dst
  contribution aggregate. N and the per-iteration dangling mass are
  MODEL-SIZED exact scalars (one count, one double) collected to the
  driver and inlined as literals — the aggregation plans computing them
  are unchanged, but the former 1-row crossJoin(broadcast) relations cost
  one broadcast-build job per reference per iteration, which dominated
  wall time at fixed-cost-per-job scales (and is pure overhead at any
  scale: a literal ships with the task closure for free).
- Ranks are lazily localCheckpoint()ed per iteration — the same
  lineage-cut discipline as components.py; without it, planning cost
  doubles per round.
- Fixed iteration count (not convergence-probed): web-scale PageRank runs
  a fixed 20-50 rounds; a convergence probe would add a full extra pass
  per round for no production benefit.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(id, r) for every vertex in ``edges`` after ``iterations`` rounds.

    ``edges`` is DISTINCT-ed (parallel edges collapse — unweighted form);
    vertices with no out-edges contribute their mass uniformly to all
    vertices (dangling redistribution), so Σr stays 1 every round.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # N is a model-sized exact integer: collect it ONCE as a double literal
    # instead of crossJoin(broadcast(1-row relation)) twice per iteration —
    # each broadcast build was its own Spark job (guide §1.2: job-count is
    # the fixed-cost driver for iterative loops). Same IEEE value, same
    # downstream arithmetic.
    n = F.lit(float(nodes.count()))
    # deg is iteration-invariant but was re-derived (a full keyed count
    # over e) TWICE per iteration — contrib's join and the dangling
    # anti-join; one lineage cut computes it once.
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
        .localCheckpoint(eager=False)
    )
    ranks = nodes.select("id", (F.lit(1.0) / n).alias("r"))
    d = F.lit(damping)
    for _ in range(iterations):
        ranks = ranks.localCheckpoint(eager=False)  # referenced twice below
        contrib = (
            e.join(deg, "src")
            .join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("cr"))
        )
        # the dangling mass is ONE double per iteration — the same keyed
        # anti-join + sum as before, collected instead of broadcast (one
        # job either way, but the crossJoin disappears from every
        # downstream plan)
        dm = F.lit(
            ranks.join(deg, ranks.id == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
            .first()[0]
        )
        ranks = nodes.join(contrib, "id", "left").select(
            "id",
            (
                (F.lit(1.0) - d) / n
                + d * (F.coalesce(F.col("cr"), F.lit(0.0)) + dm / n)
            ).alias("r"),
        )
    return ranks


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
) -> DataFrame:
    """Multi-source BFS: (id, dist) — the minimum hop count from any
    vertex in ``sources`` (a 1-column relation, column name = ``src``'s)
    along directed edges, up to ``max_hops``; unreachable vertices are
    absent. The reachability/shortest-path companion to
    :func:`pagerank` and components.py (seed-set expansion: "everything
    within K hops of the flagged accounts / seed domains").

    Each hop is one keyed join (frontier⋈edges on src) + one keyed min —
    the same two-shuffle round as every iterative operator here, with
    per-round lineage cuts. The frontier relation only carries vertices
    NEWLY reached this hop (anti-join vs visited), so total work is
    O(edges within the reached ball), not O(hops x edges).
    """
    visited = (
        sources.select(F.col(src).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0))
        .localCheckpoint(eager=False)
    )
    e = edges.select(F.col(src).alias("id"), F.col(dst).alias("nbr"))
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.select("id"), "id")
            .select(F.col("nbr").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("dist", F.lit(hop))
            .localCheckpoint(eager=False)
        )
        # every per-hop relation is already a checkpoint leaf, so the
        # running union needs no cut of its own — checkpointing it too
        # re-materialized the whole visited set every hop (one extra job
        # and a second copy of the blocks, per hop) for a plan that is
        # just a union of ≤max_hops leaf scans
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Global triangle count over the UNDIRECTED simple graph induced by
    ``edges`` (direction and parallel edges collapse; self-loops drop) —
    the standard graph-health/clustering statistic.

    The classic ordered-wedge plan: orient every edge low->high, join
    wedges (a<b, b<c) on the middle vertex, then close each wedge with a
    semi-join against the oriented edge set (a<c holds transitively, so
    each triangle is counted exactly once). Two keyed shuffles over the
    edge relation — O(Σ deg²) wedge work, the known bound; at 100 TB the
    wedge join is the cost center and partitions by vertex.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("lo"), F.greatest("a", "b").alias("hi")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    wedges = (
        e.select(F.col("lo").alias("a"), F.col("hi").alias("b"))
        .join(
            e.select(F.col("lo").alias("b"), F.col("hi").alias("c")),
            "b",
        )
    )
    closed = wedges.join(
        e.select(F.col("lo").alias("a"), F.col("hi").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))


def personalized_pagerank(
    edges: DataFrame,
    sources: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank: teleport (and dangling mass) return to the
    SEED distribution instead of uniform — the recommendation/relevance
    form ("importance relative to these seed accounts/domains"). p0 is
    uniform over ``sources`` (1-column relation named like ``src``);
    r_{t+1} = (1-d)·p0 + d·(WᵀD⁻¹ r_t + dangling_t · p0).

    Same two-keyed-shuffles-per-iteration shape as :func:`pagerank`; the
    p0 relation is seed-sized and joins broadcast. Vertices unreachable
    from the seeds converge to rank 0 (they still appear, with r=0 —
    callers filter if they want the reachable set only; compare
    :func:`bfs_levels` which omits them).
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    seeds = sources.select(F.col(src).alias("id")).distinct()
    # seed count: one exact-integer collect replaces the per-build 1-row
    # broadcast (same job-count rationale as pagerank's N literal)
    ns = F.lit(float(seeds.count()))
    p0 = (
        nodes.join(seeds.withColumn("__is_seed", F.lit(1)), "id", "left")
        .select(
            "id",
            F.when(F.col("__is_seed").isNotNull(), 1.0 / ns)
            .otherwise(0.0)
            .alias("p0"),
        )
        .localCheckpoint(eager=False)
    )
    # iteration-invariant out-degree, cut once (see pagerank)
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("double").alias("outdeg"))
        .localCheckpoint(eager=False)
    )
    ranks = p0.select("id", F.col("p0").alias("r"))
    d = F.lit(damping)
    for _ in range(iterations):
        ranks = ranks.localCheckpoint(eager=False)
        contrib = (
            e.join(deg, "src")
            .join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("cr"))
        )
        dm = F.lit(
            ranks.join(deg, ranks.id == deg.src, "left_anti")
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dm"))
            .first()[0]
        )
        ranks = p0.join(contrib, "id", "left").select(
            "id",
            (
                (F.lit(1.0) - d) * F.col("p0")
                + d
                * (
                    F.coalesce(F.col("cr"), F.lit(0.0))
                    + dm * F.col("p0")
                )
            ).alias("r"),
        )
    return ranks


def ancestor_rollup(
    nodes: DataFrame,
    id_col: str,
    parent_expr: str,
    value_col: str,
    root_pred: str,
    max_depth: int = 64,
    row_limit: int | None = None,
) -> DataFrame:
    """Hierarchy subtree rollup via Spark's native recursive CTE
    (WITH RECURSIVE, SQL:1999 / Spark 4.x): for every node, walk its
    ancestor chain ``id -> parent_expr(id) -> ...`` until ``root_pred``
    holds, then aggregate each ancestor's subtree (self included):
    member count, sum of ``value_col``, and max chain depth below it —
    the org-chart / BOM rollup classic, expressed as ENGINE-side
    recursion instead of a driver loop (contrast bfs_levels above, which
    iterates in Python because BFS needs frontier de-dup that recursive
    UNION ALL cannot express).

    ``parent_expr`` / ``root_pred`` are SQL fragments over the column
    ``cur`` (e.g. ``"cur DIV 10"`` / ``"cur = 0"``), interpolated
    VERBATIM into the recursive CTE — they are trusted code from the
    caller (exactly like ``DataFrame.selectExpr``), not data; never pass
    user-supplied strings. References to ``cur`` are rewritten with a
    word-boundary match, so identifiers merely CONTAINING the letters
    (``currency``) pass through untouched. A FUNCTIONAL
    hierarchy where each node has exactly one parent, so the recursion
    grows linearly (rows x depth), never combinatorially: each iteration
    is a pure map-side projection of the previous step, no join at all.
    ``max_depth`` bounds the recursion against a non-terminating parent
    function (Spark also enforces its own recursion row/level limits).

    Scale: total recursive output is n x chain-depth rows (depth is
    log_b(keyspace) for a b-ary key hierarchy); the only shuffle is the
    final keyed rollup aggregate. Spark additionally guards recursion
    with ``spark.sql.cteRecursionRowLimit`` (default 1,000,000 TOTAL
    recursive rows — measured: a 200k-node forest at depth ~6 trips it);
    pass ``row_limit`` sized to n x depth and the operator raises the
    session conf to at least that (it applies at EXECUTION time, so it
    cannot be scoped-and-restored around a lazy plan — documented
    session-level knob, exactly like shuffle.partitions). Returns
    (ancestor, n_subtree, sum_<value_col>, max_depth_below).
    """
    spark = nodes.sparkSession
    if row_limit is not None:
        current = int(spark.conf.get("spark.sql.cteRecursionRowLimit"))
        if 0 < current < row_limit:
            spark.conf.set("spark.sql.cteRecursionRowLimit", str(int(row_limit)))
    # word-boundary rewrite: identifiers merely containing 'cur'
    # (currency, curve, current_date) must pass through untouched
    parent_sql = re.sub(r"\bcur\b", "(cur)", parent_expr)
    view = f"__anc_nodes_{abs(hash((id_col, parent_expr, root_pred, id(nodes)))) % 10**10}"
    nodes.select(
        F.col(id_col).alias("node"), F.col(value_col).alias("val")
    ).createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        WITH RECURSIVE chain(node, cur, depth, val) AS (
          SELECT node, node, 0, val FROM {view}
          UNION ALL
          SELECT node, {parent_sql}, depth + 1, val
          FROM chain WHERE NOT ({root_pred}) AND depth < {int(max_depth)}
        )
        SELECT cur AS ancestor,
               COUNT(*) AS n_subtree,
               SUM(val) AS sum_val,
               MAX(depth) AS max_depth_below
        FROM chain
        GROUP BY cur
        """
    )
    return out.withColumnRenamed("sum_val", f"sum_{value_col}")


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999) — the link-analysis
    companion to :func:`pagerank`: authority(v) accumulates the hub
    scores of v's in-neighbors, hub(u) the authority scores of u's
    out-neighbors, L1-normalized each half-step. Returns
    (id, hub, authority) for every vertex (vertices missing from a side
    score 0.0 there).

    Determinism doctrine, one step stricter than pagerank's (whose
    per-dst contribution sums are few-term): every score is re-rounded
    to 12 dp each half-step and summed as exact DECIMAL(38,12), so both
    the keyed contribution sums and the GLOBAL normalization total are
    combine-order-free; the only double op per half-step is one division
    of two engine-identical values, then the round. An oracle unrolls
    the same half-steps verbatim.

    Scale: per half-step ONE edges⋈scores keyed join + keyed sum, plus
    a 1-row broadcast total — the pagerank shuffle shape; lineage cut
    per half-step (lazy localCheckpoint)."""
    if iterations < 1:
        raise ValueError(f"need iterations >= 1, got {iterations}")
    dec = "decimal(38,12)"
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    hubs = e.select(F.col("src").alias("id")).distinct()
    auths = e.select(F.col("dst").alias("id")).distinct()
    h = hubs.select("id", F.lit(1.0).alias("h")).localCheckpoint(eager=False)
    a = None
    for _ in range(iterations):
        # each half-step's raw-score relation is referenced twice (the
        # global total + the normalized projection) — one lineage cut
        # computes the keyed sum once; the total is ONE double per
        # half-step, collected exactly as the old broadcast's
        # cast("double") produced it (the DECIMAL sum is engine-exact, so
        # the collected double is bit-identical to the crossJoin form)
        raw_a = (
            e.join(h.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("h").cast(dec)).alias("raw"))
            .localCheckpoint(eager=False)
        )
        tot_a = F.lit(
            raw_a.agg(F.sum("raw").cast("double").alias("tot")).first()[0]
        )
        a = raw_a.select(
            "id",
            F.round(F.col("raw").cast("double") / tot_a, 12).alias("a"),
        )
        raw_h = (
            e.join(a.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum(F.col("a").cast(dec)).alias("raw"))
            .localCheckpoint(eager=False)
        )
        tot_h = F.lit(
            raw_h.agg(F.sum("raw").cast("double").alias("tot")).first()[0]
        )
        h = raw_h.select(
            "id",
            F.round(F.col("raw").cast("double") / tot_h, 12).alias("h"),
        )
    nodes = hubs.union(auths).distinct()
    return (
        nodes.join(h, "id", "left")
        .join(a, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("h"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("a"), F.lit(0.0)).alias("authority"),
        )
    )
