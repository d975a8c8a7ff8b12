"""Referential check: broadcast semi/anti join against a small manifest.

The columnar analogue of the reference's existence check — expected key
not found ⇒ ``does not exist`` violation
(`/root/reference/fs_schema_validator/utils.py:6-11`,
``report.py:24-25``). The manifest key set is built once on the driver
(or distributed for big manifests), shipped to workers via ``ray.put``
**once**, and each ``map_batches`` task probes it vectorized — no shuffle
of the big side, ever.

Two membership structures:

* exact: sorted uint64 key-hash array (8 B/key; fine into the hundreds of
  millions of keys),
* Bloom filter (north_star): ~1.2 GiB per 10^9 keys at fpp=1e-4, for
  manifests that outgrow the exact array. A Bloom false positive can only
  *suppress* a violation (rate ≤ fpp), never invent one.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fs_schema_validator_ray.report import VIOLATION_SCHEMA
from fs_schema_validator_ray.rules import ReferentialRule
from fs_schema_validator_ray.stages.scalar import PARTITION_COLUMN
from fs_schema_validator_ray.state import BloomFilter, hash64
from fs_schema_validator_ray.state.sketches import stable_key_array


def build_membership(keys, use_bloom: bool = False, fpp: float = 1e-4):
    """Build the broadcastable membership structure from manifest keys.

    Keys canonicalize through ``stable_key_array`` so the hash matches the
    probe side regardless of null presence in either batch (to_numpy's
    int→float promotion would hash 5 as 5.0 — valid keys then read as
    missing). Null manifest entries whitelist nothing and are dropped."""
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        arr = stable_key_array(keys.drop_null())
    else:
        arr = np.asarray(keys)
        if arr.dtype == object or arr.dtype.kind in ("U", "S"):
            arr = arr.astype(object)
    if use_bloom:
        bf = BloomFilter(len(arr), fpp=fpp)
        bf.add(arr)
        return bf
    return np.sort(hash64(arr))


def membership_from_dataset(ds, column: str, use_bloom: bool = False, fpp: float = 1e-4):
    """Distributed build: hash per batch on workers, merge tiny partials on
    the driver. Only the hashed key column ever reaches the driver."""
    def partial(t: pa.Table) -> pa.Table:
        vals = stable_key_array(t.column(column).combine_chunks().drop_null())
        h1, h2 = BloomFilter.hash_pair(vals)
        return pa.table({"h1": pa.array(h1, pa.uint64()), "h2": pa.array(h2, pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    h1 = parts["h1"].to_numpy(dtype=np.uint64)
    if use_bloom:
        bf = BloomFilter(len(h1), fpp=fpp)
        bf.add_hashes(h1, parts["h2"].to_numpy(dtype=np.uint64))
        return bf
    return np.unique(h1)


def _probe(membership, values: np.ndarray) -> np.ndarray:
    """True where the value IS present."""
    if isinstance(membership, BloomFilter):
        return membership.contains(values)
    if len(membership) == 0:  # empty manifest → everything is missing
        return np.zeros(len(values), dtype=bool)
    h = hash64(values)
    idx = np.searchsorted(membership, h)
    idx = np.clip(idx, 0, len(membership) - 1)
    return membership[idx] == h


def canonical_tuple_strings(batch: pa.Table, columns) -> np.ndarray:
    """Canonical composite-key strings (US-separator join, nulls spelled
    ``\x00null``) — the SAME form ``stages/unique.py`` composite mode
    uses, so unique/referential tuple semantics agree."""
    cols = [batch.column(c).to_pylist() for c in columns]
    out = np.empty(batch.num_rows, dtype=object)
    for i, row in enumerate(zip(*cols)):
        out[i] = "\x1f".join(
            "\x00null" if v is None else str(v) for v in row
        )
    return out


class ReferentialStage:
    """``map_batches`` callable. Construct with the ``ray.ObjectRef`` of the
    membership structure (``ray.put`` once on the driver); each worker
    resolves it on first use and caches it — broadcast, not per-batch
    shipping."""

    def __init__(self, rule: ReferentialRule, membership_ref) -> None:
        self.rule = rule
        self.membership_ref = membership_ref
        self._membership = None

    def _resolve(self):
        if self._membership is None:
            import ray

            obj = self.membership_ref
            self._membership = ray.get(obj) if hasattr(obj, "hex") else obj
        return self._membership

    def __call__(self, batch: pa.Table) -> pa.Table:
        rule = self.rule
        membership = self._resolve()
        composite = getattr(rule, "columns", None)
        if composite:
            values = canonical_tuple_strings(batch, composite)
            nulls = np.zeros(len(values), bool)  # tuples probe literally
        else:
            col = batch.column(rule.column).combine_chunks()
            # canonical conversion (matches the membership build): a null
            # in THIS batch must not change how the non-null keys hash
            values = stable_key_array(col)
            nulls = (
                np.asarray(col.is_null())
                if col.null_count
                else np.zeros(len(col), bool)
            )
        present = np.zeros(len(values), dtype=bool)
        if (~nulls).any():
            present[~nulls] = _probe(membership, values[~nulls])
        missing = np.flatnonzero(~present)
        if PARTITION_COLUMN in batch.column_names:
            parts = np.asarray(batch.column(PARTITION_COLUMN).combine_chunks().cast(pa.int32()))
        else:
            parts = np.full(len(values), -1, np.int32)
        reason = f"does not exist in manifest `{rule.manifest}`"
        return pa.Table.from_arrays(
            [
                pa.array(parts[missing].astype(np.int32, copy=False)),
                pa.array([None if nulls[i] else str(values[i]) for i in missing], pa.string()),
                pa.array([rule.rule_id] * len(missing), pa.string()),
                pa.array([reason] * len(missing), pa.string()),
            ],
            schema=VIOLATION_SCHEMA,
        )
