"""Violation model + report rendering.

The reference accumulates ``ValidationError(path, reason)`` rows in a
single mutable, mergeable ``ValidationReport``
(``/root/reference/fs_schema_validator/report.py``). In the Ray engine
violations are **data**: every stage emits an Arrow table with the
violation schema and the streaming executor concatenates them; the
driver-side ``ViolationReport`` below exists only for small results —
tests, CLI rendering, exit codes — mirroring the reference's grouped
rendering (``report.py:27-33``, ``__main__.py:82-94``).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from collections.abc import Iterator

import pyarrow as pa

#: Arrow schema of the violations stream. ``partition_id`` keys resumable
#: checkpoints; ``key`` is the record key (``clip_id`` for the clips table —
#: the analogue of the reference's ``path``); ``rule_id`` names the rule;
#: ``reason`` is a stable human-readable string.
VIOLATION_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int32()),
        pa.field("key", pa.string()),
        pa.field("rule_id", pa.string()),
        pa.field("reason", pa.string()),
    ]
)


def empty_violations() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()


def violations_table(
    keys: list,
    rule_ids: list,
    reasons: list,
    partition_ids: list | None = None,
) -> pa.Table:
    """Build a violations Arrow table from parallel columns."""
    n = len(keys)
    if partition_ids is None:
        partition_ids = [-1] * n
    return pa.table(
        {
            "partition_id": pa.array(partition_ids, pa.int32()),
            "key": pa.array(keys, pa.string()),
            "rule_id": pa.array(rule_ids, pa.string()),
            "reason": pa.array(reasons, pa.string()),
        }
    )


@dataclass(frozen=True)
class Violation:
    """One violation row (reference ``ValidationError``, ``report.py:10-14``),
    extended with the rule id and the checkpoint partition."""

    key: str
    rule_id: str
    reason: str
    partition_id: int = -1


@dataclass
class ViolationReport:
    """Small driver-side accumulator over materialized violation tables.

    Only used on small results; at scale violations stay a Dataset.
    """

    violations: list[Violation] = field(default_factory=list)
    ok_keys: list[str] = field(default_factory=list)

    @staticmethod
    def from_arrow(table: pa.Table, ok_keys: list[str] | None = None) -> "ViolationReport":
        rows = table.to_pylist()
        return ViolationReport(
            violations=[
                Violation(
                    key=r["key"],
                    rule_id=r["rule_id"],
                    reason=r["reason"],
                    partition_id=r.get("partition_id", -1),
                )
                for r in rows
            ],
            ok_keys=list(ok_keys or []),
        )

    def okay(self) -> bool:
        return not self.violations

    def count(self) -> int:
        return len(self.violations) + len(self.ok_keys)

    def reasons_for(self, key: str) -> set[str]:
        return {v.reason for v in self.violations if v.key == key}

    def grouped_by_key(self) -> Iterator[tuple[str, list[str]]]:
        """Deterministic (sorted) grouping for rendering, independent of
        execution order — the engine-level analogue of the reference's
        sort-then-group (``report.py:27-33``)."""
        ordered = sorted(self.violations, key=lambda v: (v.key, v.rule_id, v.reason))
        for key, vs in itertools.groupby(ordered, key=lambda v: v.key):
            yield key, [v.reason for v in vs]

    def merge(self, other: "ViolationReport") -> "ViolationReport":
        return ViolationReport(
            violations=self.violations + other.violations,
            ok_keys=self.ok_keys + other.ok_keys,
        )

    def render(self) -> str:
        """Human-readable summary (reference ``__main__.py:82-94``)."""
        lines = [f"ok {k}" for k in sorted(self.ok_keys)]
        for key, reasons in self.grouped_by_key():
            lines.append(f"FAIL {key}")
            lines.extend(f"     - {r}" for r in reasons)
        return "\n".join(lines)
