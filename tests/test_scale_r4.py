"""Round-4 scale behaviors: data-aware shuffle-bucket sizing (bucket count
must grow with input bytes, not just CPU count — VERDICT r3 item 1)."""

import pyarrow as pa
import pytest
import ray.data

from fs_schema_validator_ray.stages.dedup import (
    DEFAULT_TARGET_BUCKET_BYTES,
    default_n_buckets,
    estimate_dataset_bytes,
)

SF = "/root/testdata/sf0.01"


def test_estimate_from_pruned_read(ray_session):
    full = ray.data.read_parquet(f"{SF}/lineitem.parquet")
    pruned = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    fb, pb = estimate_dataset_bytes(full), estimate_dataset_bytes(pruned)
    assert fb is not None and pb is not None
    assert pb < fb  # column pruning is visible to the sizing


def test_estimate_walks_lineage_through_transforms(ray_session):
    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet").map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    est = estimate_dataset_bytes(ds)
    base = estimate_dataset_bytes(ray.data.read_parquet(f"{SF}/lineitem.parquet"))
    assert est == base  # falls back to the upstream read's metadata


def test_bucket_count_scales_with_data(ray_session):
    ds = ray.data.read_parquet(f"{SF}/lineitem.parquet")
    floor = default_n_buckets()  # no dataset → CPU floor
    assert floor >= 16
    # small input at the default 256 MiB target stays at the floor
    assert default_n_buckets(ds) == floor
    # shrink the target to emulate a 1000× corpus: count must exceed the
    # CPU-derived floor and track ceil(bytes / target)
    est = estimate_dataset_bytes(ds)
    target = 64 * 1024
    n = default_n_buckets(ds, target_bucket_bytes=target)
    assert n == max(floor, -(-est // target))
    assert n > floor


def test_bucket_count_sums_multiple_inputs(ray_session):
    a = ray.data.read_parquet(f"{SF}/lineitem.parquet")
    b = ray.data.read_parquet(f"{SF}/orders.parquet")
    target = 64 * 1024
    n_join = default_n_buckets(a, b, target_bucket_bytes=target)
    n_a = default_n_buckets(a, target_bucket_bytes=target)
    assert n_join > n_a  # both sides of an exchange count


def test_unknown_lineage_falls_back_to_floor(ray_session):
    ds = ray.data.from_arrow(pa.table({"x": list(range(10))}))
    # from_arrow may or may not expose size metadata; either way the
    # result is a sane positive count and never raises
    n = default_n_buckets(ds)
    assert n >= 16
    assert default_n_buckets(None) == default_n_buckets()


def test_default_target_is_256mib():
    assert DEFAULT_TARGET_BUCKET_BYTES == 256 * 2**20
