#!/usr/bin/env python
"""Generate a larger scale factor locally from the sf0.1 fixtures (round-9
verdict item 4: the bench has only ever run at sf0.1; SCALE.md slopes come
from corpus-shaped synthetic blowups, so an sf1 checkpoint catches
constant-overhead-dominated timings and slope anomalies those missed).

No network (DuckDB's tpch extension cannot download), so sf1 is built by
KEY-SHIFTED REPLICATION of the driver's sf0.1 tables — each replica is an
independent sub-database, exactly how TPC-H scales (key ranges grow,
value distributions repeat):

  - region/nation stay fixed-size (they are constant-size in TPC-H);
  - customer/supplier/part/orders/lineitem/events shift every key column
    by replica*max_key so join fan-outs and per-key series lengths are
    preserved while distinct-key counts grow linearly;
  - documents get a PER-REPLICA TOKEN SUFFIX (disjoint vocabularies), so
    shingle document frequencies stay CONSTANT — naive text replication
    would multiply every DF by the replica count and quadratically blow
    up the co-occurrence joins, measuring fixture degeneracy instead of
    operator scaling (the tools/scale_run.py doctrine); n_chars is
    recomputed from the rewritten text;
  - embeddings get deterministic +-0.5 per-component jitter per replica
    (cosine between replicas ~0.87, far below near-dup thresholds) so
    planted dup clusters scale linearly instead of merging across
    replicas.

Usage: python tools/gen_sf.py [--factor 10] [--out /tmp/ah_sf1]
Then:  SPARK_GRAFT_SF_DIR=/tmp/ah_sf1 python bench.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"

#: key columns shifted per replica: table -> {col: stride-source-col}
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
#: stride per key column = (max over the table that OWNS the key) + 1,
#: so foreign keys shift by the same stride as their primary table
KEY_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    # vec_id shifts by the DOCUMENTS stride: suite queries (hybrid_rrf_topk)
    # fuse vec_id and doc_id as ONE id space, so replica k's vectors must
    # align with replica k's documents, not alias replica 0's
    "vec_id": ("documents", "doc_id"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/ah_sf1")
    args = ap.parse_args()

    from arrowhouse_spark.session import get_spark

    spark = get_spark(app_name="gen_sf")
    os.makedirs(args.out, exist_ok=True)

    strides: dict[str, int] = {}
    for col, (tbl, own_col) in KEY_OWNER.items():
        if col not in strides:
            mx = (
                spark.read.parquet(f"{SRC}/{tbl}.parquet")
                .agg(F.max(own_col))
                .collect()[0][0]
            )
            strides[col] = int(mx) + 1

    for tbl in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{args.out}/{tbl}.parquet")
        print(f"{tbl}: copied")

    for tbl, keys in KEYED.items():
        t0 = time.time()
        base = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        reps = spark.range(args.factor).select(F.col("id").alias("__rep"))
        df = base.crossJoin(F.broadcast(reps))
        for k in keys:
            df = df.withColumn(
                k, (F.col(k) + F.col("__rep") * F.lit(strides[k])).cast("long")
            )
        if tbl == "documents":
            # disjoint vocabulary per replica: prefix every token with
            # r<rep>_ (replica 0 keeps the original bytes, so sf0.1 is a
            # strict subset); token COUNT is preserved, so length-based
            # quality gates see the same distribution
            toks = F.split(F.col("text"), " ")
            marked = F.array_join(
                F.transform(
                    toks,
                    lambda t: F.when(t == "", t).otherwise(
                        F.concat(
                            F.lit("r"),
                            F.col("__rep").cast("string"),
                            F.lit("_"),
                            t,
                        )
                    ),
                ),
                " ",
            )
            df = df.withColumn(
                "text",
                F.when(F.col("__rep") == 0, F.col("text")).otherwise(marked),
            ).withColumn("n_chars", F.length("text").cast("long"))
        if tbl == "embeddings":
            jit = F.transform(
                F.col("embedding"),
                lambda x, j: F.when(
                    F.col("__rep") == 0, x
                ).otherwise(
                    x
                    + (
                        F.pmod(
                            F.xxhash64(F.col("vec_id"), F.col("__rep"), j),
                            F.lit(2001),
                        )
                        - F.lit(1000)
                    ).cast("float")
                    / F.lit(2000.0)
                ).cast("float"),  # keep array<float>: when() would promote
            )
            df = df.withColumn("embedding", jit)
        df.drop("__rep").repartition(32).write.mode("overwrite").parquet(
            f"{args.out}/{tbl}.parquet"
        )
        n = spark.read.parquet(f"{args.out}/{tbl}.parquet").count()
        print(f"{tbl}: {n} rows ({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
