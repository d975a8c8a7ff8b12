"""Asset-validation stage: the reference's glTF/GLB and ZIP validators
(F4/F5) as a stateless ``map_batches`` pass emitting violation rows.

Reference parity: `/root/reference/fs_schema_validator/schemas/gltf.py:29-46`
(deserialize + ``nodes`` non-emptiness) and `schemas/zip.py:19-32`
(``testzip()`` CRC sweep); reason strings are byte-identical, including
the corrupted-fixture deserialize messages (see
``functions/assets.py``). Per-row loop is the work itself (variable-
size binary decode, same shape as ``ImageValidateStage``)."""

from __future__ import annotations

import pyarrow as pa

from fs_schema_validator_ray.report import VIOLATION_SCHEMA
from fs_schema_validator_ray.stages.scalar import PARTITION_COLUMN


class AssetValidateStage:
    """``(key, bytes, format)`` batches → violation rows; ``format`` in
    {gltf, glb, zip}."""

    def __init__(
        self,
        rule_id: str = "asset_decode",
        bytes_column: str = "bytes",
        format_column: str | None = "format",
        key_column: str = "key",
        fixed_format: str | None = None,
    ) -> None:
        if format_column is None and fixed_format is None:
            raise ValueError("need format_column or fixed_format")
        self.rule_id = rule_id
        self.bytes_column = bytes_column
        self.format_column = format_column
        self.key_column = key_column
        self.fixed_format = fixed_format

    @classmethod
    def from_rule(cls, rule, key_column: str = "clip_id") -> "AssetValidateStage":
        """Build from a declarative :class:`rules.AssetRule`."""
        return cls(
            rule_id=rule.rule_id,
            bytes_column=rule.bytes_column,
            format_column=rule.format_column,
            key_column=key_column,
            fixed_format=rule.format,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fs_schema_validator_ray.functions.assets import (
            validate_gltf,
            validate_zip,
        )

        names = batch.column_names
        n = batch.num_rows
        payloads = batch.column(self.bytes_column).to_pylist()
        fmts = (
            [self.fixed_format] * n
            if self.format_column is None
            else batch.column(self.format_column).to_pylist()
        )
        keys = (
            batch.column(self.key_column).to_pylist()
            if self.key_column in names
            else [None] * n
        )
        parts = (
            batch.column(PARTITION_COLUMN).to_pylist()
            if PARTITION_COLUMN in names
            else [-1] * n
        )

        out_key, out_part, out_reason = [], [], []
        for i in range(n):
            p = payloads[i]
            if p is None or len(p) == 0:
                reasons = ["cannot be empty"]
            elif fmts[i] in ("gltf", "glb"):
                reasons = validate_gltf(p, fmts[i])
            elif fmts[i] == "zip":
                reasons = validate_zip(p)
            else:
                reasons = [f"unknown asset format {fmts[i]!r}"]
            for r in reasons:
                out_key.append(None if keys[i] is None else str(keys[i]))
                out_part.append(-1 if parts[i] is None else parts[i])
                out_reason.append(r)

        import numpy as np

        return pa.Table.from_arrays(
            [
                pa.array(np.asarray(out_part, dtype=np.int32)),
                pa.array(out_key, pa.string()),
                pa.array([self.rule_id] * len(out_key), pa.string()),
                pa.array(out_reason, pa.string()),
            ],
            schema=VIOLATION_SCHEMA,
        )
