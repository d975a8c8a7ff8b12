"""Per-query execution explainer: run a named ``queries()`` entry and
print its Ray Data execution stats (operator wall times, block counts,
rows in/out per stage) — the "measure, don't guess" loop for spotting a
stage that materializes, starves, or dominates.

Usage:
    python tools/explain.py <query_name> [sf_dir] [--cpus N]

Example:
    python tools/explain.py stats_lineitem /root/testdata/sf0.1 --cpus 32
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        from fs_schema_validator_ray.pipelines.queries import QUERIES

        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; options:", file=sys.stderr)
            for name in sorted(QUERIES):
                print(f"  {name}", file=sys.stderr)
            return 2
        t0 = time.perf_counter()
        res = QUERIES[args.query](args.sf_dir)
        if hasattr(res, "materialize"):
            # materialize the FINAL result so stats attach to the executed
            # plan (count() runs a cloned plan and reports no stats); the
            # result table is query-output-sized, not corpus-sized
            mat = res.materialize()
            n = mat.count()
            wall = time.perf_counter() - t0
            print(f"== {args.query} @ {args.sf_dir} ({args.cpus} cpus) ==")
            print(f"rows={n} wall={wall:.3f}s")
            print()
            print(mat.stats())
        else:
            n = len(res)
            wall = time.perf_counter() - t0
            print(f"== {args.query} @ {args.sf_dir} ({args.cpus} cpus) ==")
            print(f"rows={n} wall={wall:.3f}s")
            print("(driver-side result — no Ray Data plan to explain)")
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
