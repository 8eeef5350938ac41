#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

For every query in __spark_entry__.queries():
  - run the Spark DataFrame at the given sf dir;
  - if an oracle exists, run it in DuckDB over the same parquet views;
  - compare row count, column-name sets, and values (rows sorted by all
    columns, floats compared with tolerance).

Usage: python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]

``--tail N`` restricts to the queries BEYOND the first N of queries()'s
priority order — the rotation tail the driver's capped window will not check
this round — and ``--json PATH`` writes driver-format records, so committing
``CORRECTNESS_local_r{N}.json`` gives every registered query a current-round
proof (driver window ∪ local tail).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if isinstance(v, bytes):
        return v.hex()
    import decimal

    if isinstance(v, decimal.Decimal):
        # canonical exact string for sorting/printing; comparison is exact
        # in _rows_equal (the driver hashes values exactly — a float()
        # collapse with relative tolerance hid integer discrepancies of up
        # to ~1e10 on DECIMAL(38,0) energies in round 13)
        if v.is_nan():
            return "Decimal(NaN)"
        return format(v.normalize(), "f")
    return v


def _rows_equal(a, b) -> bool:
    import decimal

    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, decimal.Decimal) or isinstance(y, decimal.Decimal):
            # Decimal vs Decimal/int: exact comparison (scale-insensitive:
            # Decimal('1.0') == Decimal('1.00'), and Decimal(3) == 3).
            # Decimal vs float keeps the float-tolerance path below — a
            # genuinely float column on one side cannot be compared exactly.
            if not isinstance(x, float) and not isinstance(y, float):
                xn = x.is_nan() if isinstance(x, decimal.Decimal) else False
                yn = y.is_nan() if isinstance(y, decimal.Decimal) else False
                if xn and yn:
                    continue
                if xn != yn or x != y:
                    return False
                continue
        x, y = _norm(x), _norm(y)
        if x is None or y is None:
            if x is not y:
                return False
        elif isinstance(x, float) or isinstance(y, float):
            try:
                fx, fy = float(x), float(y)
            except (TypeError, ValueError):
                return False
            if math.isnan(fx) and math.isnan(fy):
                continue
            if abs(fx - fy) > 1e-6 * max(1.0, abs(fx), abs(fy)):
                return False
        elif x != y:
            return False
    return True


def _sort_key(row):
    return tuple(
        (v is None, str(type(v).__name__), str(_norm(v))) for v in row
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01"))
    ap.add_argument("--tail", type=int, default=None, metavar="N",
                    help="only check queries beyond the first N of the priority order")
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="write driver-format result records to PATH")
    ap.add_argument("--chunk-size", type=int, default=None, metavar="N",
                    help="run the registry in fresh subprocesses of N queries "
                    "each and merge (the driver isolates every query per "
                    "process; one long-lived process accumulates JVM caches + "
                    "DuckDB pools until tiny allocations bad_alloc — observed "
                    "on the 94-query registry)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.chunk_size:
        import json as _json
        import subprocess
        import sys as _sys
        import tempfile

        import __spark_entry__ as entry_mod

        names = args.names or list(entry_mod.queries())
        # --tail applies BEFORE chunking (same registry-order semantics as
        # the non-chunk path) so the flags compose instead of the tail
        # filter being silently dropped by the subprocesses
        if args.tail is not None:
            names = list(entry_mod.queries())[args.tail:]
        merged: dict[str, dict] = {}
        rc = 0
        # per-invocation scratch dir: a crashed chunk must surface as a
        # missing file (hard failure), never as silently-merged stale
        # records from a previous run, and concurrent runs must not
        # clobber each other's chunk files
        with tempfile.TemporaryDirectory(prefix="ah_check_") as tmpdir:
            for i in range(0, len(names), args.chunk_size):
                chunk = names[i : i + args.chunk_size]
                tmp = os.path.join(tmpdir, f"chunk_{i}.json")
                cmd = [_sys.executable, os.path.abspath(__file__), "--sf",
                       args.sf, "--json", tmp, *chunk]
                r = subprocess.run(cmd, check=False)
                rc = rc or r.returncode
                try:
                    with open(tmp) as f:
                        merged.update(_json.load(f))
                except Exception as e:  # noqa: BLE001
                    print(f"chunk {i}: no records ({e})", file=_sys.stderr)
                    rc = rc or 1
            # OOM poisoning retry: a heavy oracle (e.g. the bit-exact
            # minhash pipeline SQL) can exhaust the chunk PROCESS's memory
            # so every later query in that chunk fails on tiny duckdb
            # allocations — and the chunk may die before writing its file.
            # Both shapes (an OOM-failed record, a name with no record at
            # all) are re-proven one query per fresh process; a genuine
            # failure reproduces solo, a poisoned one goes green.
            retry = [
                n for n in names
                if n not in merged
                or "Out of Memory" in (merged[n].get("err") or "")
            ]
            if retry:
                print(f"retrying {len(retry)} queries solo "
                      f"(chunk OOM poisoning): {retry}", file=_sys.stderr)
                for n in retry:
                    tmp = os.path.join(tmpdir, f"retry_{n}.json")
                    cmd = [_sys.executable, os.path.abspath(__file__),
                           "--sf", args.sf, "--json", tmp, n]
                    subprocess.run(cmd, check=False)
                    try:
                        with open(tmp) as f:
                            merged.update(_json.load(f))
                    except Exception as e:  # noqa: BLE001
                        print(f"retry {n}: no record ({e})", file=_sys.stderr)
                # the final verdict comes from the merged records (solo
                # re-proofs supersede the poisoned chunk results); missing
                # records stay failures via the completeness check below
                def _rec_failed(rec: dict) -> bool:
                    if (rec.get("err") or None) not in (None, "no_oracle"):
                        return True
                    return any(
                        rec.get(k) is False
                        for k in ("rows_match", "schema_match", "hash_match")
                    )

                rc = int(
                    any(n not in merged for n in names)
                    or any(_rec_failed(merged[n]) for n in names if n in merged)
                )
        if args.json:
            with open(args.json, "w") as f:
                _json.dump(merged, f, indent=1)
            print(f"wrote {args.json} ({len(merged)} records, chunked)")
        return rc

    import duckdb

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    # Deliberately a PLAIN session (not session.get_spark): the driver's
    # harness builds its own SparkSession without the engine's confs, so the
    # local gate must reproduce that environment or it hides conf-dependent
    # bugs (e.g. the r01 nanos-timestamp read failure).
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    def fresh_con():
        # one connection per query: the driver isolates each query in its own
        # process; a single long-lived connection accumulates buffer/thread
        # state across 70+ queries and eventually dies with bad_alloc
        c = duckdb.connect()
        # explicit cap + spill dir: DuckDB otherwise sizes its limit from
        # memory FREE at connect time, so a concurrent JVM makes the oracle
        # die with bad_alloc on queries that would happily spill. The cap
        # is env-tunable: the ~0.6 MB generated minhash SQL models
        # intermittently fragment a 6GB pool into a bad_alloc cascade (and
        # a duckdb.so segfault on unwind) — solo runs on this box should
        # use 24GB+ via AH_DUCKDB_MEM.
        try:
            mem = os.environ.get("AH_DUCKDB_MEM", "6GB")
            c.execute(f"SET memory_limit='{mem}'")
            c.execute("SET temp_directory='/tmp/duckdb_spill'")
        except Exception:  # noqa: BLE001 — older duckdb: keep defaults
            pass
        for t in TABLES:
            p = f"{args.sf}/{t}.parquet"
            if os.path.exists(p):
                c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return c

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    if args.tail is not None:
        names = [n for n in qs if n not in set(list(qs)[: args.tail])]
    n_pass = n_fail = n_weak = 0
    records: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        rec = records[name] = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            rec["err"] = f"spark: {e}"[:200]
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(srows)} cols={scols} ({time.time()-t0:.1f}s) [no oracle]")
            rec["err"] = "no_oracle"
            n_weak += 1
            continue
        try:
            # close on the error path too — a leaked connection re-accumulates
            # the buffer/thread state the per-query isolation exists to avoid
            con = fresh_con()
            try:
                ddf = con.execute(oracles[name])
                dcols = [d[0] for d in ddf.description]
                drows = [tuple(r) for r in ddf.fetchall()]
            finally:
                con.close()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            rec["err"] = f"duckdb: {e}"[:200]
            n_fail += 1
            continue
        rec["oracle_rows"] = len(drows)
        rec["rows_match"] = len(srows) == len(drows)
        rec["schema_match"] = sorted(scols) == sorted(dcols)
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            # align column order by sorted name on both sides (driver semantics)
            sidx = [scols.index(c) for c in sorted(scols)]
            didx = [dcols.index(c) for c in sorted(dcols)]
            sa = sorted(([r[i] for i in sidx] for r in srows), key=_sort_key)
            da = sorted(([r[i] for i in didx] for r in drows), key=_sort_key)
            bad = 0
            for x, y in zip(sa, da):
                if not _rows_equal(x, y):
                    bad += 1
                    if bad <= 3:
                        problems.append(f"row diff: spark={x} duckdb={y}")
            if bad > 3:
                problems.append(f"... {bad} differing rows total")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            rec["hash_match"] = False
            n_fail += 1
        else:
            print(f"ok    {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            rec["hash_match"] = True
            n_pass += 1
    print(f"\n{n_pass} ok, {n_weak} weak (no oracle), {n_fail} FAIL")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {args.json} ({len(records)} records)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
