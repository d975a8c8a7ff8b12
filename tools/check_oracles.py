"""Local stand-in for the driver's correctness gate.

Runs every ``__ray_entry__.queries()`` entry at the given sf_dir, runs the
matching ``oracle_sql()`` in DuckDB over the same parquet files, and
compares row count + schema + an order-insensitive value hash (columns
sorted by name, rows sorted, values stringified). Queries without an
oracle get a rows-only smoke check.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    # ray Dataset: an empty dataset's to_pandas() loses column names —
    # rebuild them from the Dataset schema so 0-row results still compare.
    # Root cause (verified round 5): Ray's sort-based groupby/aggregate
    # emits schema-less EMPTY blocks for empty reduce partitions — a bare
    # `ray.data.from_arrow(...).groupby(k).aggregate(Sum(...))` with zero
    # user code reproduces the "RefBundle with a different schema …
    # new schema: ." warning on ray 2.49. Our own map fns all emit
    # declared-schema empty tables (audited via the full-sweep log); the
    # residual warnings and this workaround guard the Ray-internal case.
    df = res.to_pandas()
    if df.shape[1] == 0:
        schema = res.schema()
        if schema is not None and schema.names:
            df = pd.DataFrame(columns=schema.names)
    return df


def canonical(df: pd.DataFrame) -> tuple:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: repr(v))
    rows = sorted(map(tuple, df.itertuples(index=False, name=None)))
    import hashlib

    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return len(rows), list(df.columns), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    unknown = only - set(qs)
    if unknown:
        print(f"FAIL  unknown query name(s): {sorted(unknown)}")
        failures += len(unknown)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(mine)} rows, cols={sorted(mine.columns)}")
            continue
        theirs = con.sql(oracles[name]).df()
        mn, mc, mh = canonical(mine)
        tn, tc, th = canonical(theirs)
        ok = (mn, mc, mh) == (tn, tc, th)
        if mn == 0 and tn == 0 and not ok:
            # both empty: values trivially agree; Ray's empty-dataset
            # schema loses select_columns projections, so column-name
            # equality is unknowable here — count it as a pass with note
            print(f"ok   {name}: both sides empty (schema unknowable on "
                  f"empty Ray results: {mc} vs {tc})")
            continue
        status = "ok   " if ok else "FAIL "
        print(f"{status}{name}: mine=({mn} rows, {mh}) oracle=({tn} rows, {th}) cols {mc} vs {tc}")
        if not ok:
            failures += 1
            if mc == tc and mn and tn:
                m = mine[sorted(mine.columns)].astype(str).apply(tuple, axis=1)
                t_ = theirs[sorted(theirs.columns)].astype(str).apply(tuple, axis=1)
                only_m = set(m) - set(t_)
                only_t = set(t_) - set(m)
                print(f"      only-mine({len(only_m)}): {list(only_m)[:3]}")
                print(f"      only-oracle({len(only_t)}): {list(only_t)[:3]}")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
