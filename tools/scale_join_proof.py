"""Round-5 scale proof #2: the distributed hash join at multi-GiB scale.

Reuses the 120M-row wide-string-key table from scale_bucket_proof.py as
the FACT side and derives a 64-char-key DIMENSION side (one row per
distinct key mod 4 — 25% selectivity), then runs the repo's
`hash_join` (adaptive skew machinery live) and gates the result
value-level against DuckDB: matched-row count, sum(v) over matches and
the order-independent hash·v checksum mod 2^61-1.

Usage: python tools/scale_join_proof.py [--cpus C] [--dir D]
(run scale_bucket_proof.py first to generate the input)
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MOD = (1 << 61) - 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--dir", default="/tmp/scale_bucket_input")
    ap.add_argument("--dim-dir", default="/tmp/scale_join_dim")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(args.dir, "*.parquet")))
    if not files:
        raise SystemExit("run tools/scale_bucket_proof.py first")

    # dimension build (cached): distinct keys with int(key) % 4 == 0
    os.makedirs(args.dim_dir, exist_ok=True)
    dim_path = os.path.join(args.dim_dir, "dim.parquet")
    if not os.path.exists(dim_path):
        import duckdb

        duckdb.sql(
            f"""
            COPY (SELECT k, CAST(hash(k) % 1000 AS BIGINT) AS w
                  FROM (SELECT DISTINCT k FROM '{args.dir}/*.parquet')
                  WHERE CAST(ltrim(k, 'x') AS BIGINT) % 4 = 0)
            TO '{dim_path}' (FORMAT PARQUET)
            """
        )
        print("dim built", flush=True)

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data

    from fs_schema_validator_ray.stages.joins import hash_join
    from fs_schema_validator_ray.state.sketches import hash64, stable_key_array

    fact = ray.data.read_parquet(files, columns=["k", "v"])
    dim = ray.data.read_parquet(dim_path).map_batches(
        lambda t: t.rename_columns(["dk", "w"]), batch_format="pyarrow"
    )
    t0 = time.time()
    joined = hash_join(fact, dim, "k", "dk", ["v"], ["w"])

    def partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t.column("v"), np.int64)
        h = (hash64(stable_key_array(t.column("k"))) % np.uint64(MOD)).astype(
            np.int64
        )
        chk = int(np.sum((h.astype(object) * v.astype(object)) % MOD) % MOD)
        return pa.table(
            {
                "rows": pa.array([t.num_rows], pa.int64()),
                "sum_v": pa.array([int(v.sum())], pa.int64()),
                "chk": pa.array([chk], pa.int64()),
            }
        )

    rows = 0
    sum_v = 0
    chk = 0
    for b in joined.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        rows += int(np.asarray(b.column("rows"), np.int64).sum())
        sum_v += int(np.asarray(b.column("sum_v"), np.int64).sum())
        chk = (chk + int(np.asarray(b.column("chk"), np.int64).astype(object).sum())) % MOD
    wall = time.time() - t0
    ray.shutdown()

    import duckdb

    dn, dsum = duckdb.sql(
        f"""
        SELECT COUNT(*), SUM(f.v)
        FROM '{args.dir}/*.parquet' f JOIN '{dim_path}' d ON f.k = d.k
        """
    ).fetchone()
    dchk = 0
    cur = duckdb.sql(
        f"""
        SELECT f.k, f.v FROM '{args.dir}/*.parquet' f
        JOIN '{dim_path}' d ON f.k = d.k
        """
    )
    while True:
        batch = cur.fetch_df_chunk(8)
        if batch is None or not len(batch):
            break
        hk = (hash64(batch["k"].to_numpy()) % np.uint64(MOD)).astype(np.int64)
        vv = batch["v"].to_numpy().astype(np.int64)
        dchk = (dchk + int(np.sum((hk.astype(object) * vv.astype(object)) % MOD))) % MOD

    print(json.dumps({
        "num_cpus": args.cpus,
        "join_wall_sec": round(wall, 2),
        "rows": rows, "sum_v": sum_v, "checksum": chk,
        "duckdb_rows": int(dn), "duckdb_sum_v": int(dsum),
        "duckdb_checksum": int(dchk),
        "hash_exact": bool(rows == dn and sum_v == dsum and chk == dchk),
    }))


if __name__ == "__main__":
    main()
