"""Self-check harness: run every RAY query against its DuckDB oracle twin and
compare row count + column names + order-insensitive values — a local replica
of the driver's CORRECTNESS gate.  Run from /root/repo:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(res, Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        # round floats BEFORE the row sort (the driver hashes rounded rows):
        # sorting on raw floats misaligns the two frames whenever engines
        # differ in the last bits among near-ties — q33's 5.7e-14 sum drift
        # flipped sort order and reported a spurious datetime mismatch
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(4)
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return False, f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    a, b = canon(a), canon(b)
    for c in a.columns:
        if str(a[c].dtype).startswith("float"):
            if not np.allclose(
                a[c].to_numpy(), b[c].astype("float64").to_numpy(), atol=1e-9, equal_nan=True
            ):
                bad = np.where(~np.isclose(a[c], b[c].astype("float64"), atol=1e-9))[0][:3]
                return False, f"float col {c} differs at rows {bad.tolist()}"
        else:
            if not a[c].equals(b[c].astype(a[c].dtype)):
                bad = a.index[a[c] != b[c].astype(a[c].dtype)][:3]
                return False, f"col {c} differs e.g. rows {list(bad)}: {a[c].iloc[bad[0]]!r} vs {b[c].iloc[bad[0]]!r}"
    return True, "ok"


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    from ner_ray.pipelines.queries import RAY_QUERIES, oracle_sql_catalog

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    import time

    # the FULL twin catalog (dynamic fixture twins included) — what the
    # driver actually consumes, not just the static ORACLE_SQL subset
    for name, sql in oracle_sql_catalog().items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(RAY_QUERIES[name](sf_dir)))
            oracle = canon(con.execute(sql).df())
            ok, why = compare(mine, oracle)
        except Exception as e:
            ok, why = False, f"EXC {type(e).__name__}: {e}"
        dt = time.perf_counter() - t0
        print(f"{'PASS' if ok else 'FAIL'} {name:28s} {dt:6.1f}s  {why if not ok else ''}")
        if not ok:
            failures.append(name)
    if only:
        pass
    print("FAILURES:", failures or "none")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
