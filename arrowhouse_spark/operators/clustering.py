"""Distributed Lloyd's k-means — fully declarative, engine-replayable.

The companion surface to similarity.py's ``ivf_centroids_kmeans``
(which fits centroids driver-side in numpy on a BOUNDED collected
sample, the right call for IVF index builds): here every step —
assignment, centroid update, iteration — is a DataFrame plan, so the
fit itself distributes, nothing is collected, and a SQL oracle can
replay the whole unrolled iteration exactly. The iterative-algorithm
family next to graph.py's pagerank/BFS and components.py's
min-label propagation.

Determinism doctrine (the label_centroid_sim / source_entropy_report
precedent, pushed one step further because centroids FEED the next
round's argmin):

- squared-distance terms are quantized to DECIMAL(38,12) and summed
  EXACTLY per (point, centroid) — combine-order-free, so the argmin
  sees identical keys on any engine;
- argmin is min-dist + min-cid-at-min-dist (two exact aggregates, no
  struct/row comparators an oracle might order differently);
- centroid updates sum DECIMAL(38,10)-quantized coordinates exactly,
  divide once in double, and ROUND to 9 dp — the rounded double is the
  value both engines carry into the next iteration.

Seeding is the k smallest ids' vectors (deterministic, fixture-free);
the centroid LABEL is the seed's id itself, so no ranking window is
needed anywhere. A centroid that loses every member simply drops out
of later iterations (documented; k-means-- behavior) — with min-id
seeding this requires the seed itself to defect, which real corpora
essentially never produce at small k.

Scale: per iteration the plan is (a) explode points to (id, dim, val)
— map-side, (b) join the k x dim centroid relation (BROADCAST — k*dim
rows, corpus-size-free), (c) one keyed exact sum per (id, cid), (d)
one keyed argmin per id, (e) one keyed mean per (cid, dim). Shuffles
are all keyed by point id or (cid, dim); nothing global, nothing
collected, no Python. Lineage is cut per iteration with
localCheckpoint(eager=False) — the staged-pipeline seam discipline
(suite pipeline_pretrain_full) — so the unrolled plan does not
re-inline iteration i-1 into every branch of iteration i.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DIST_T = "decimal(38,12)"
_COORD_T = "decimal(38,10)"


def _explode_vecs(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).cast("long").alias("__id"),
        F.posexplode(vec_col).alias("__dim", "__v"),
    ).withColumn("__v", F.col("__v").cast("double"))


def _assign(pts: DataFrame, centroids: DataFrame) -> DataFrame:
    """(__id, __cid) argmin assignment from exploded points against the
    (__cid, __dim, __c) centroid relation — exact decimal distances."""
    d = F.col("__v") - F.col("__c")
    dists = (
        pts.join(F.broadcast(centroids), "__dim")
        .select("__id", "__cid", (d * d).cast(_DIST_T).alias("__t"))
        .groupBy("__id", "__cid")
        .agg(F.sum("__t").alias("__dist"))
    )
    mind = dists.groupBy("__id").agg(F.min("__dist").alias("__dist"))
    return (
        dists.join(mind, ["__id", "__dist"])
        .groupBy("__id")
        .agg(F.min("__cid").alias("__cid"))
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    iters: int = 2,
) -> DataFrame:
    """Run ``iters`` exact Lloyd iterations from min-id seeds; returns
    the final assignment with its exact squared distance:
    (``id_col``, cluster_id, sqdist DECIMAL(38,12)) — cluster_id is the
    seed point's id."""
    if k < 1 or iters < 1:
        raise ValueError(f"need k/iters >= 1, got {k}/{iters}")
    pts = _explode_vecs(df, id_col, vec_col)
    seeds = df.select(F.col(id_col).cast("long").alias("__sid"), vec_col)
    seeds = seeds.orderBy("__sid").limit(k)
    centroids = seeds.select(
        F.col("__sid").alias("__cid"),
        F.posexplode(vec_col).alias("__dim", "__c"),
    ).withColumn("__c", F.col("__c").cast("double"))
    for _ in range(iters):
        assign = _assign(pts, centroids)
        centroids = (
            pts.join(assign, "__id")
            .groupBy("__cid", "__dim")
            .agg(
                F.round(
                    F.sum(F.col("__v").cast(_COORD_T)).cast("double")
                    / F.count(F.lit(1)),
                    9,
                ).alias("__c")
            )
            .localCheckpoint(eager=False)
        )
    final = _assign(pts, centroids)
    d = F.col("__v") - F.col("__c")
    sqd = (
        pts.join(final, "__id")
        .join(F.broadcast(centroids), ["__dim", "__cid"])
        .select("__id", "__cid", (d * d).cast(_DIST_T).alias("__t"))
        .groupBy("__id", "__cid")
        .agg(F.sum("__t").alias("sqdist"))
    )
    return sqd.select(
        F.col("__id").alias(id_col),
        F.col("__cid").alias("cluster_id"),
        "sqdist",
    )
