"""Local mirror of the driver's correctness gate.

Runs every queries() entry and its oracle_sql() side-by-side over an
sf dir and reports row-count / schema / value matches. Usage:

    python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ours = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: ray error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(ours)} rows, cols {list(ours.columns)})")
            continue
        try:
            theirs = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if len(ours) != len(theirs):
            print(f"FAIL  {name}: rows {len(ours)} vs oracle {len(theirs)}")
            failures.append(name)
            continue
        if list(ours.columns) != list(theirs.columns):
            print(f"FAIL  {name}: cols {list(ours.columns)} vs {list(theirs.columns)}")
            failures.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(
                ours, theirs, check_dtype=False, check_exact=True
            )
            print(f"PASS  {name} ({len(ours)} rows)")
        except AssertionError as e:
            print(f"FAIL  {name}: value mismatch: {str(e)[:500]}")
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
