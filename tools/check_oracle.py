"""Driver-style correctness harness: run every ``queries()`` entry and its
``oracle_sql()`` twin side-by-side on a testdata dir, compare row count,
schema (column names), and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(canon(df).to_csv(index=False).encode()).hexdigest()[:16]


def main():
    argv = list(sys.argv[1:])
    json_path = None
    if "--json" in argv:
        i = argv.index("--json")
        json_path = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    records: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append(name)
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": None,
                             "oracle_rows": None,
                             "err": f"ray: {type(e).__name__}: {e}"}
            print(f"FAIL {name}: ray side raised {type(e).__name__}: {e}")
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            records[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": len(got),
                             "oracle_rows": None, "err": "no_oracle"}
            print(f"rows-only {name}: {len(got)} rows, cols={sorted(got.columns)} ({dt:.1f}s)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            records[name] = {"rows_match": False, "schema_match": False,
                             "hash_match": False, "spark_rows": len(got),
                             "oracle_rows": None,
                             "err": f"oracle: {type(e).__name__}: {e}"}
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            continue
        ok_rows = len(got) == len(want)
        ok_cols = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_cols and value_hash(got) == value_hash(want)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        records[name] = {"rows_match": ok_rows, "schema_match": ok_cols,
                         "hash_match": ok_hash, "spark_rows": len(got),
                         "oracle_rows": len(want), "err": None}
        print(
            f"{status} {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} hash_ok={ok_hash} ({dt:.1f}s)"
        )
        if not ok_hash and ok_rows and ok_cols:
            a, b = canon(got), canon(want)
            neq = (a != b).any(axis=1)
            if neq.any():
                i = int(np.nonzero(neq.to_numpy())[0][0])
                print("  first diff row (ray):", a.iloc[i].to_dict())
                print("  first diff row (sql):", b.iloc[i].to_dict())
        elif not ok_cols:
            print(f"  ray cols: {sorted(got.columns)}; sql cols: {sorted(want.columns)}")

    print("\nFAILURES:", failures if failures else "none")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {json_path} ({len(records)} queries)")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
