#!/usr/bin/env python
"""Per-query profiler: isolated wall time + Spark JOB COUNT per query.

At sf0.1 the suite's inputs are ~15 MB, so a query's wall time is dominated
by fixed per-job costs (scheduling, stage setup, py4j round-trips), not data
volume. Job count is therefore the primary optimization signal for the
store-lifecycle / pipeline queries: every collect/localCheckpoint/write is
one job, and shaving jobs is what transfers to 100 TB too (fewer passes).

Usage:
  python tools/profile_queries.py [--sf DIR] [--reps N] [--explain-dir D] q1 q2 ...

Prints one line per query: name, min/all wall seconds, job count (last rep),
and with --explain-dir writes <dir>/<name>.txt with explain("formatted").
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain-dir", default="")
    args = ap.parse_args()

    from arrowhouse_spark import suite
    from arrowhouse_spark.session import get_spark

    spark = get_spark(app_name="profile-queries")
    sc = spark.sparkContext
    qs = suite.queries()

    # same warmups as bench.py so the first query is not charged for them
    spark.read.parquet(f"{args.sf}/lineitem.parquet").limit(1).count()

    def _warm(batches):
        import numpy  # noqa: F401, PLC0415

        for b in batches:
            yield b

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(4 * cpus).repartition(4 * cpus).mapInPandas(
        _warm, "id long"
    ).write.format("noop").mode("overwrite").save()

    for name in args.names:
        fn = qs[name]
        times = []
        njobs = 0
        for rep in range(args.reps):
            group = f"{name}-rep{rep}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = fn(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            tracker = sc.statusTracker()
            njobs = len(tracker.getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
            if args.explain_dir and rep == 0:
                os.makedirs(args.explain_dir, exist_ok=True)
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(args.explain_dir, f"{name}.txt"), "w"
                ) as f:
                    f.write(buf.getvalue())
            import gc

            gc.collect()
        print(
            f"{name:40s} min={min(times):7.3f}s all={times} jobs={njobs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
