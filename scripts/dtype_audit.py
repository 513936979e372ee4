"""Replicate the driver's correctness-gate hashing semantics locally.

The driver compares Spark results (via toPandas) against DuckDB oracle
results (via .df()) by sorting columns by name and hashing stringified
values. A DuckDB HUGEINT comes back as pandas float64 ("123.0") while
Spark BIGINT is int64 ("123") — values equal, hashes differ. This script
runs EVERY registry entry at the given sf and reports:
  - dtype-class divergence (int vs float) per column,
  - actual stringified-value mismatches on the first rows.

Usage: python scripts/dtype_audit.py [sf_dir] [entry_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as entry_mod  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def dtype_class(dt) -> str:
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "other"


def stringify(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.astype(str)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("dtype-audit")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duck_con(sf_dir)

    bad = []
    for i, (name, fn) in enumerate(queries.items()):
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"[{i:3d}] {name}: no_oracle (rows-only)")
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
            dkdf = con.execute(oracles[name]).df()
        except Exception as e:  # pragma: no cover - audit tool
            bad.append((name, f"ERROR {type(e).__name__}: {e}"))
            print(f"[{i:3d}] {name}: ERROR {e}")
            continue
        issues = []
        sp_cols, dk_cols = sorted(spdf.columns), sorted(dkdf.columns)
        if sp_cols != dk_cols:
            issues.append(f"cols {sp_cols} vs {dk_cols}")
        else:
            for c in sp_cols:
                sc, dc = dtype_class(spdf[c].dtype), dtype_class(dkdf[c].dtype)
                if sc != dc and "other" not in (sc, dc):
                    issues.append(f"{c}: spark={spdf[c].dtype}/{sc} duck={dkdf[c].dtype}/{dc}")
            if len(spdf) == len(dkdf) and not issues:
                ss = stringify(spdf).sort_values(sp_cols).reset_index(drop=True)
                ds = stringify(dkdf).sort_values(sp_cols).reset_index(drop=True)
                neq = (ss != ds).any(axis=None)
                if neq:
                    diff_cols = [c for c in sp_cols if (ss[c] != ds[c]).any()]
                    issues.append(f"string-value mismatch in {diff_cols}")
            elif len(spdf) != len(dkdf):
                issues.append(f"rows {len(spdf)} vs {len(dkdf)}")
        status = "OK" if not issues else "; ".join(issues)
        print(f"[{i:3d}] {name}: {status}")
        if issues:
            bad.append((name, status))

    print(f"\n{len(bad)} entries with driver-hash risk:")
    for name, msg in bad:
        print(f"  {name}: {msg}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
