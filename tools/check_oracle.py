#!/usr/bin/env python3
"""DEV-ONLY oracle pre-validation (mirrors the driver's t2 check; not part of
the shipped Spark library). Usage:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                str(type(v)).endswith("ndarray'>") else v)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark dump ({e})")
            n_fail += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        try:
            # Exact compare, mirroring the driver's hash check (a tolerance
            # here masked the q4 decimal-vs-double mismatch in round 1).
            # Pass --tol to loosen while debugging numeric drift.
            if "--tol" in sys.argv:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=False, rtol=1e-9, atol=1e-12)
            else:
                pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                              check_exact=True)
            print(f"OK   {name}: {len(g)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch: {str(e)[:500]}")
            n_fail += 1
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} oracles matched")

    # Negative control: perturb one oracle and require the compare to FAIL —
    # a checker that can't fail is not a gate. Runs by default (cheap); the
    # control query is the first alphabetically whose result has >= 1 row
    # (LIMIT count-1 on a 0-row result would be LIMIT -1: a DuckDB error or
    # all-rows no-op, either way a spurious gate verdict).
    if n_fail == 0 and oracles and "--no-negative-control" not in sys.argv:
        name = next((n for n in sorted(oracles)
                     if len(con.execute(oracles[n]).df()) >= 1), None)
        if name is None:
            print("NEGATIVE CONTROL SKIPPED: every oracle returns 0 rows")
            return 0
        got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        want = canon(con.execute(
            f"SELECT * FROM ({oracles[name]}) LIMIT (SELECT count(*) - 1 "
            f"FROM ({oracles[name]}))").df())
        try:
            if len(got) == len(want):
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=True)
            control_failed = len(got) != len(want)
        except AssertionError:
            control_failed = True
        if control_failed:
            print(f"NEGATIVE CONTROL OK ({name} perturbed -> compare fails)")
        else:
            print(f"NEGATIVE CONTROL BROKEN: perturbed {name} still matched")
            return 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
