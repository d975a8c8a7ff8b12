"""Incremental-dedup store gates: batch-1 accepts all distinct, batch-2
accepts only the genuinely new, re-ingesting is idempotent (zero
accepted), and in-batch duplicates resolve to min id."""

import os

import numpy as np
import pyarrow as pa
import ray.data

from fs_schema_validator_ray.pipelines.incremental import (
    _store_manifest,
    dedup_ingest,
)


def _batch(texts, start_id=0):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    range(start_id, start_id + len(texts)), pa.int64()
                ),
                "text": texts,
            }
        )
    ).repartition(3)


def test_incremental_dedup_store(ray_session, tmp_path):
    store = str(tmp_path / "store")
    os.makedirs(store)

    b1 = ["alpha doc", "beta doc", "gamma doc", "alpha doc", "delta doc"]
    acc1, s1 = dedup_ingest(_batch(b1), store, n_buckets=4)
    rows1 = sorted(r["doc_id"] for r in acc1.take_all())
    assert s1["n_accepted"] == 4  # in-batch dup of "alpha doc" collapsed
    assert rows1 == [0, 1, 2, 4]  # min id kept for the in-batch dup
    assert _store_manifest(store)["n_fingerprints"] == 4

    # batch 2: overlap with the store + one new + an in-batch dup pair
    b2 = ["beta doc", "epsilon doc", "epsilon doc", "delta doc"]
    acc2, s2 = dedup_ingest(_batch(b2, start_id=100), store)
    rows2 = sorted(r["text"] for r in acc2.take_all())
    assert s2["n_accepted"] == 1 and rows2 == ["epsilon doc"]
    assert _store_manifest(store)["n_fingerprints"] == 5

    # idempotence: same batch again accepts nothing
    acc3, s3 = dedup_ingest(_batch(b2, start_id=200), store)
    assert s3["n_accepted"] == 0 and acc3.count() == 0
    assert _store_manifest(store)["n_ingests"] == 3

    # bucket mismatch is refused loudly
    import pytest

    with pytest.raises(ValueError, match="buckets"):
        dedup_ingest(_batch(["x doc here"]), store, n_buckets=8)
