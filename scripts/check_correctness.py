#!/usr/bin/env python
"""Local replica of the driver's correctness run at an arbitrary sf dir.

Usage: PYTHONPATH=. python scripts/check_correctness.py [sf_dir]
Runs every queries() entry against its oracle_sql() in DuckDB and prints a
per-query PASS/FAIL summary (row count + sorted-value equality).
"""

import sys
import time

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_df(res):
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()


def _canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(np.float64)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import ray
    import ray.data as rd
    ncpu = int(__import__("os").environ.get("RAY_GRAFT_CPUS", 16))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ml_data_pipeline_ray.context import tune_data_context
    tune_data_context(ncpu)

    import __ray_entry__ as e
    q = e.queries()
    o = e.oracle_sql()
    # map the oracle fixture scale to this sf dir
    from ml_data_pipeline_ray.pipelines.fixture_paths import scale_for_sf_dir, fixture_paths
    scale = scale_for_sf_dir(SF_DIR)
    fixture_paths(scale); fixture_paths(scale, evolve=True)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, fn in q.items():
        t0 = time.time()
        try:
            got = _canon(_to_df(fn(SF_DIR)))
            if name in o:
                sql = o[name].replace("/tmp/mdpr_fixtures/small",
                                      f"/tmp/mdpr_fixtures/{scale}")
                want = _canon(con.sql(sql).df())
                assert list(got.columns) == list(want.columns), \
                    f"cols {list(got.columns)} vs {list(want.columns)}"
                assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
                status = "PASS"
            else:
                status = f"ROWS-ONLY({len(got)})"
            n_pass += 1
        except Exception as ex:
            status = f"FAIL: {str(ex)[:140]}"
            n_fail += 1
        print(f"{name:32s} {time.time()-t0:7.2f}s  {status}")
    print(f"\n{n_pass} ok, {n_fail} failed @ {SF_DIR}")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
