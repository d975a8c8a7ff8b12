#!/usr/bin/env python
"""Generate a small deterministic demo corpus (clips + transcript manifest).

Usage: python examples/generate_corpus.py [/tmp/demo_corpus] [n_rows]

The corpus is the synthetic clips table from FIXTURES.md §1 — WAV/PCM and
μ-law/A-law payloads with planted violations (truncated bytes, codec
mismatches, duplicate ids, garbled transcripts, …), one parquet file per
partition plus ``transcripts.parquet`` for the referential rule.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fs_schema_validator_ray.sources.clips import (  # noqa: E402
    ClipsConfig,
    build_clips_table,
    build_manifest_table,
)


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/demo_corpus"
    n_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    cfg = ClipsConfig(n_rows=n_rows, rows_per_partition=max(1, n_rows // 4))
    clips_dir = os.path.join(root, "clips")
    os.makedirs(clips_dir, exist_ok=True)
    for pid in range(cfg.num_partitions()):
        lo = pid * cfg.rows_per_partition
        hi = min(cfg.n_rows, lo + cfg.rows_per_partition)
        t = build_clips_table(cfg, np.arange(lo, hi)).drop_columns(["partition_id"])
        pq.write_table(t, os.path.join(clips_dir, f"part-{pid:04d}.parquet"))
    pq.write_table(build_manifest_table(cfg), os.path.join(root, "transcripts.parquet"))
    print(f"wrote {cfg.n_rows} clips in {cfg.num_partitions()} partitions to {root}")
    print("validate with:")
    print(
        "  python -m fs_schema_validator_ray examples/clips-rules.yaml "
        f"-i {clips_dir} -o /tmp/demo_run --manifest {root}/transcripts.parquet "
        '-b "strictness=strict" -v'
    )


if __name__ == "__main__":
    main()
