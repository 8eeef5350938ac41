#!/usr/bin/env python
"""Exact-value determinism audit for the query registry.

The driver's correctness gate hashes result VALUES exactly, while the
local gate (tools/check_correctness.py) compares floats with 1e-6
relative tolerance. That gap hid the round-7 `decayed_event_score`
flake: a double sum whose partial-aggregation combine order varies run
to run landed 4e-8 from a 6-dp rounding boundary — green under the
tolerance gate every local run, red in one driver run.

This tool closes the gap on both axes, with NO tolerance anywhere:

1. **Self-determinism**: run every query's Spark side TWICE with
   different physical partitioning (spark.sql.shuffle.partitions 16 vs
   7, spark.sql.files.maxPartitionBytes 128m vs 1m) — different scan
   splits and reduce widths force different floating-point combine
   orders — and exact-compare the collected values (float bits, not
   tolerance). Any diff is a latent driver-hash flake even when both
   runs would pass the oracle under tolerance.
2. **Oracle exactness**: exact-compare the run-1 values against the
   DuckDB oracle and report the max relative float diff. 0.0 means the
   driver's value hash is safe; a nonzero diff below 1e-6 is precisely
   the "passes locally, can fail the driver" shape.

Usage:
  python tools/check_determinism.py [--sf DIR] [--json PATH]
      [--chunk-size N] [names...]

Chunking spawns fresh subprocesses per N queries for the same reason as
check_correctness.py (JVM cache + DuckDB pool accumulation across a
180+-query registry).
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _key(v):
    """Exact, hashable, order-stable encoding of one value."""
    if v is None:
        return ("\x00null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("\x01nan",)
        return ("f", v.hex())
    if isinstance(v, bytes):
        return ("b", v.hex())
    import decimal

    if isinstance(v, decimal.Decimal):
        # EXACT canonical encoding (round-13 verdict #8): the former
        # float(v) collapse could not see integer discrepancies beyond
        # 2^53 on DECIMAL(38,0) columns, so "oracle_exact" certified an
        # exactness it could not observe. Scale-insensitive plain string
        # ('1.0' and '1.00' both encode as '1').
        if v.is_nan():
            return ("\x01nan",)
        return ("d", format(v.normalize(), "f"))
    return ("v", str(type(v).__name__), str(v))


def _canon(rows, cols):
    """Rows → sorted tuple of exact value keys, columns aligned by name."""
    idx = [cols.index(c) for c in sorted(cols)]
    return sorted(tuple(_key(r[i]) for i in idx) for r in rows)


def _max_rel_diff(a_rows, b_rows):
    """Max relative float diff between two canonicalized row lists that
    are equal under exact non-float compare; inf if structure differs."""
    worst = 0.0
    if len(a_rows) != len(b_rows):
        return float("inf")
    for ra, rb in zip(a_rows, b_rows):
        if len(ra) != len(rb):
            return float("inf")
        for ka, kb in zip(ra, rb):
            if ka == kb:
                continue
            # numeric kinds: float ("f", hex) and exact decimal ("d",
            # plain string). Equal-kind decimals that differ are REAL
            # value diffs; mixed decimal/float pairs (one engine types the
            # column differently) compare as floats — both report the
            # relative diff instead of collapsing to inf
            if ka[0] in ("f", "d") and kb[0] in ("f", "d"):
                fa = float.fromhex(ka[1]) if ka[0] == "f" else float(ka[1])
                fb = float.fromhex(kb[1]) if kb[0] == "f" else float(kb[1])
                worst = max(
                    worst, abs(fa - fb) / max(1.0, abs(fa), abs(fb))
                )
            else:
                return float("inf")
    return worst


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01"),
    )
    ap.add_argument("--json", default=None, metavar="PATH")
    ap.add_argument("--chunk-size", type=int, default=None, metavar="N")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.chunk_size:
        import json as _json
        import subprocess
        import tempfile

        import __spark_entry__ as entry_mod

        names = args.names or list(entry_mod.queries())
        merged: dict[str, dict] = {}
        rc = 0
        with tempfile.TemporaryDirectory(prefix="ah_det_") as tmpdir:
            for i in range(0, len(names), args.chunk_size):
                chunk = names[i : i + args.chunk_size]
                tmp = os.path.join(tmpdir, f"chunk_{i}.json")
                cmd = [
                    sys.executable, os.path.abspath(__file__),
                    "--sf", args.sf, "--json", tmp, *chunk,
                ]
                r = subprocess.run(cmd, check=False)
                rc = rc or r.returncode
                try:
                    with open(tmp) as f:
                        merged.update(_json.load(f))
                except Exception as e:  # noqa: BLE001
                    print(f"chunk {i}: no records ({e})", file=sys.stderr)
                    rc = rc or 1
        if args.json:
            with open(args.json, "w") as f:
                _json.dump(merged, f, indent=1)
            print(f"wrote {args.json} ({len(merged)} records, chunked)")
        n_bad = sum(
            1 for r in merged.values()
            if not (r.get("det_match") and r.get("oracle_exact", True))
        )
        print(f"{len(merged) - n_bad} exact, {n_bad} at-risk")
        return rc or int(
            any(not r.get("det_match", True) for r in merged.values())
        )

    import duckdb

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .appName("determinism-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    def fresh_con():
        c = duckdb.connect()
        try:
            c.execute("SET memory_limit='6GB'")
            c.execute("SET temp_directory='/tmp/duckdb_spill'")
        except Exception:  # noqa: BLE001
            pass
        for t in TABLES:
            p = f"{args.sf}/{t}.parquet"
            if os.path.exists(p):
                c.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
                )
        return c

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    records: dict[str, dict] = {}
    n_ok = n_risk = n_err = 0
    # (shuffle partitions, scan split bytes): pass B forces narrow scan
    # splits + a prime reduce width so every combine tree differs from A
    passes = [("16", str(128 * 1024 * 1024)), ("7", str(1 * 1024 * 1024))]
    for name in names:
        rec = records[name] = {
            "det_match": None, "oracle_exact": None,
            "det_max_rel_diff": None, "oracle_max_rel_diff": None,
            "err": None,
        }
        runs = []
        try:
            for parts, split in passes:
                spark.conf.set("spark.sql.shuffle.partitions", parts)
                spark.conf.set("spark.sql.files.maxPartitionBytes", split)
                sdf = qs[name](spark, args.sf)
                runs.append(_canon([tuple(r) for r in sdf.collect()], sdf.columns))
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"spark: {e}"[:200]
            print(f"ERR   {name}: {rec['err']}")
            n_err += 1
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "16")
            spark.conf.set(
                "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)
            )
        d = _max_rel_diff(runs[0], runs[1])
        rec["det_match"] = runs[0] == runs[1]
        rec["det_max_rel_diff"] = None if d == float("inf") else d
        if name in oracles:
            try:
                con = fresh_con()
                try:
                    cur = con.execute(oracles[name])
                    dcols = [x[0] for x in cur.description]
                    orows = _canon([tuple(r) for r in cur.fetchall()], dcols)
                finally:
                    con.close()
                od = _max_rel_diff(runs[0], orows)
                rec["oracle_exact"] = runs[0] == orows
                rec["oracle_max_rel_diff"] = (
                    None if od == float("inf") else od
                )
            except Exception as e:  # noqa: BLE001
                rec["err"] = f"duckdb: {e}"[:200]
        ok = rec["det_match"] and rec["oracle_exact"] in (True, None)
        if ok:
            n_ok += 1
            print(f"exact {name}")
        else:
            n_risk += 1
            print(
                f"RISK  {name}: det={rec['det_match']}"
                f" (Δ={rec['det_max_rel_diff']})"
                f" oracle_exact={rec['oracle_exact']}"
                f" (Δ={rec['oracle_max_rel_diff']})"
            )
    print(f"\n{n_ok} exact, {n_risk} at-risk, {n_err} errors")
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {args.json} ({len(records)} records)")
    return int(n_risk > 0 or n_err > 0)


if __name__ == "__main__":
    sys.exit(main())
