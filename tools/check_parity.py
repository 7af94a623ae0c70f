"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query on Spark AND its oracle SQL on DuckDB at the given
sf dir, compare row count, column names, and order-insensitive values.

Usage: python tools/check_parity.py [--tail] [--json OUT] [sf_dir] [query ...]

--tail  restricts to __spark_entry__._DEFERRED_TAIL (the registered
        queries past the driver gate's 50-query budget) — the per-round
        proof artifact CORRECTNESS_tail_r{N}.json is generated with
        `--tail --json CORRECTNESS_tail_r{N}.json` (VERDICT r3 #5).
--json  writes per-query rows in the driver's CORRECTNESS_r{N}.json shape
        (rows_match / schema_match / hash_match / spark_rows /
        oracle_rows / err).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import json

    args = list(sys.argv[1:])
    json_out = None
    tail_only = False
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    if "--tail" in args:
        tail_only = True
        args.remove("--tail")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from search_engine_spark.session import get_spark

    if tail_only:
        only |= set(entrymod._DEFERRED_TAIL)

    spark = get_spark("parity-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    results: dict[str, dict] = {}

    def record(name, *, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
        results[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            record(name, err=f"spark: {e}")
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in sqls:
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(sdf), err="no oracle (rows-only check)")
            print(f"....  {name}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.execute(sqls[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"DUCKDB ERROR: {e}"))
            record(name, spark_rows=len(sdf), err=f"duckdb: {e}")
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            record(name, rows_match=len(sdf) == len(odf),
                   spark_rows=len(sdf), oracle_rows=len(odf),
                   err="column mismatch")
            print(f"FAIL {name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            record(name, schema_match=True,
                   spark_rows=len(sdf), oracle_rows=len(odf))
            print(f"FAIL {name}: row count {len(sdf)} vs {len(odf)}")
            continue
        a, b = _norm(sdf), _norm(odf)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            failures.append((name, f"{int(diff.sum())} differing rows"))
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(sdf), oracle_rows=len(odf),
                   err=f"{int(diff.sum())} differing rows")
            print(f"FAIL {name}: {int(diff.sum())}/{len(a)} rows differ")
            with pd.option_context("display.width", 200):
                print("  spark:", a[diff].head(3).to_dict("records"))
                print("  duck :", b[diff].head(3).to_dict("records"))
            continue
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(sdf), oracle_rows=len(odf))
        print(f"PASS  {name}: rows={len(sdf)}")
    spark.stop()
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {json_out} ({len(results)} queries)")
    print(f"\n{len(failures)} failures" if failures else "\nALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
