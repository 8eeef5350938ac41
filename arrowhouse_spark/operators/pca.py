"""Distributed PCA over embedding columns — covariance in ONE aggregation
pass, eigendecomposition on the driver (d x d is tiny), projection as
map-side codegen.

The factorization every corpus-embedding pipeline wants (visualization,
whitening before clustering, cheap dimensionality reduction ahead of ANN)
with the right 100 TB split: the DATA-sized work (second moments) is a
single keyed aggregate with map-side partials — the (i, j) pair explode
collapses to d(d+1)/2 groups per partition before any shuffle — while the
MODEL-sized work (eigh of a d x d matrix, d <= a few thousand) is a
bounded driver step, the same documented-bounded-collect pattern as
k-means/IVF init in operators/similarity.py:241-495. Projection back is
zip_with against literal component vectors: zero shuffles, fuses into the
scan.

Sign convention: each component is flipped so its largest-|.| coordinate
is positive — eigenvectors are defined up to sign, and pinning it makes
projections deterministic across numpy/LAPACK builds (the property tests
rely on this).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Long-format population covariance: (i, j, cov) for 0 <= i <= j <
    ``dims`` (default: full vector length). cov = E[x_i x_j] − E[x_i]E[x_j]
    from ONE pair-explode aggregate plus a broadcast means relation —
    the upper triangle only, d(d+1)/2 groups regardless of row count."""
    v = F.col(vec_col)
    if dims is None:
        dims_rel = df.select(F.size(v).alias("d")).limit(1)
        dims = dims_rel.collect()[0]["d"]  # bounded: one scalar
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda i: F.transform(
                F.sequence(i, F.lit(dims - 1)),
                lambda j: F.struct(
                    i.cast("int").alias("i"),
                    j.cast("int").alias("j"),
                    (
                        F.element_at(v, i + 1) * F.element_at(v, j + 1)
                    ).alias("xy"),
                ),
            ),
        )
    )
    cross = (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.i").alias("i"), F.col("p.j").alias("j"))
        .agg(F.avg("p.xy").alias("exy"))
    )
    means = (
        df.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(dims - 1)),
                    lambda i: F.struct(
                        i.cast("int").alias("i"),
                        F.element_at(v, i + 1).alias("x"),
                    ),
                )
            ).alias("m")
        )
        .groupBy(F.col("m.i").alias("i"))
        .agg(F.avg("m.x").alias("ex"))
    )
    mi = F.broadcast(means.select(F.col("i"), F.col("ex").alias("ex_i")))
    mj = F.broadcast(
        means.select(F.col("i").alias("j"), F.col("ex").alias("ex_j"))
    )
    return cross.join(mi, "i").join(mj, "j").select(
        "i", "j", (F.col("exy") - F.col("ex_i") * F.col("ex_j")).alias("cov")
    )


def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 4,
) -> dict:
    """Fit top-``k`` principal components. Returns {components: k x d
    ndarray (sign-pinned), explained_variance: k, total_variance: float}.
    The covariance collect is d(d+1)/2 values — model-sized, documented
    bounded."""
    # pre-explode repartition: the d(d+1)/2-pair explode and both partial
    # averages are the covariance's CPU and otherwise run fused into the
    # scan at input-split parallelism (one small file = one task, and the
    # fit path executes the subtree more than once); the cross and means
    # legs share the pinned exchange (ReusedExchange). Kept out of
    # embedding_covariance itself: for a one-shot narrow-d covariance the
    # exchange costs more than the serial explode (A/B-measured).
    from arrowhouse_spark.session import shuffle_parts

    # probe dims on the UN-repartitioned input: with dims=None the probe
    # (select(size).limit(1)) would otherwise run the full round-robin
    # shuffle map stage just to read one vector's length — an extra
    # full-scan job per fit (round-13 ADVICE)
    dims = int(
        df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()[0]["d"]
    )
    spread = df.select(F.col(vec_col)).repartition(
        shuffle_parts(df.sparkSession)
    )
    rows = embedding_covariance(spread, vec_col, dims=dims).collect()
    d = max(r["j"] for r in rows) + 1
    c = np.zeros((d, d))
    for r in rows:
        c[r["i"], r["j"]] = c[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(c)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k x d
    for m in range(comps.shape[0]):  # sign pin: largest-|.| coord positive
        mx = np.argmax(np.abs(comps[m]))
        if comps[m, mx] < 0:
            comps[m] = -comps[m]
    return {
        "components": comps,
        "explained_variance": vals[order],
        "total_variance": float(np.trace(c)),
    }


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    vec_col: str = "embedding",
    prefix: str = "pc",
    round_dp: int = 6,
) -> DataFrame:
    """Project each vector onto the fitted components: one zip_with dot
    product per component against a LITERAL array — pure map-side
    codegen, no shuffle, no UDF. (Centering is omitted: projections of
    the mean shift every coordinate by a constant, which downstream
    distance/cluster uses are invariant to; subtract ``pca_fit`` means
    first if absolute coordinates matter.)"""
    out = df
    for m, comp in enumerate(components):
        lit = F.array(*[F.lit(float(x)) for x in comp])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"{prefix}{m}", F.round(dot, round_dp))
    return out
