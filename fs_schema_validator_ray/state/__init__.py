"""Mergeable sketch state for distributed aggregation.

These are the distributed generalization of the reference's mergeable
``ValidationReport`` monoid (``/root/reference/fs_schema_validator/report.py:44-48``):
each sketch supports ``add`` (per batch), ``merge`` (associative,
commutative) and ``to_bytes``/``from_bytes`` (rides groupby-aggregate
partials and the checkpoint manifest).
"""

from fs_schema_validator_ray.state.sketches import (
    BloomFilter,
    Histogram,
    HyperLogLog,
    TDigest,
    hash64,
    ks_statistic,
    psi,
)

__all__ = [
    "BloomFilter",
    "Histogram",
    "HyperLogLog",
    "TDigest",
    "hash64",
    "ks_statistic",
    "psi",
]
