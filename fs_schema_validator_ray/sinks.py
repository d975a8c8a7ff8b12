"""Output sinks: resumable partitioned Parquet.

The write contract for 100 TB runs (cf. ``pipelines/validate.py``'s
per-partition hive output + atomic manifests): NEVER one giant file —
one directory per partition value so a failed run resumes by skipping
finished partitions and downstream readers prune at the directory level.
"""

from __future__ import annotations

import os


def write_partitioned_parquet(
    ds,
    out_dir: str,
    partition_cols: list[str],
    existing_ok: bool = True,
):
    """Write ``ds`` as hive-partitioned Parquet
    (``out_dir/col=value/…``). Each Ray block writes its own files under
    its partition directories — fully parallel, no driver funnel. Returns
    the list of partition directories created."""
    os.makedirs(out_dir, exist_ok=existing_ok)
    ds.write_parquet(out_dir, partition_cols=partition_cols)
    parts = []
    for root, dirs, _files in os.walk(out_dir):
        for d in dirs:
            if "=" in d:
                parts.append(os.path.join(root, d))
    return sorted(parts)


def read_partition_pruned(out_dir: str, partition_col: str, value):
    """Read back ONLY one partition directory — the pruning contract the
    layout exists for (no full-dataset scan to fetch one key range)."""
    import ray.data

    return ray.data.read_parquet(
        os.path.join(out_dir, f"{partition_col}={value}")
    )
