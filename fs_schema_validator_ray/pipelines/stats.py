"""Column statistics + distribution drift over a Dataset.

Partial/final sketch aggregation (the scale-safe pattern): every batch
contributes one tiny partial row per column — exact moments (count, nulls,
min, max, sum, sum-of-squares) plus serialized HLL and t-digest blobs —
and partials are merged per column. The input dataset streams once; only
kilobyte-sized partials ever move. This generalizes the reference's
mergeable ``ValidationReport`` (``report.py:44-48``) to numeric state.

Drift: per-partition fixed-bin histograms merged the same way, compared
against a baseline histogram with KS / PSI (north_rule) — partitions
whose statistic exceeds the rule threshold produce partition-level
violation rows.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fs_schema_validator_ray.report import VIOLATION_SCHEMA
from fs_schema_validator_ray.rules import DriftRule
from fs_schema_validator_ray.stages.scalar import PARTITION_COLUMN
from fs_schema_validator_ray.state import Histogram, HyperLogLog, TDigest, ks_statistic, psi


class _StatsPartial:
    """map_batches callable emitting one partial row per column per batch."""

    def __init__(self, columns: list[str]) -> None:
        self.columns = columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for name in self.columns:
            if name not in batch.column_names:
                continue
            col = batch.column(name).combine_chunks()
            n = len(col)
            nulls = col.null_count
            dtype = col.type
            is_num = pa.types.is_integer(dtype) or pa.types.is_floating(dtype)
            is_str = pa.types.is_string(dtype) or pa.types.is_large_string(dtype)

            hll = HyperLogLog(p=12)
            vmin = vmax = None
            s = ss = 0.0
            td_blob = b""
            if is_num:
                vals = np.asarray(pc.drop_null(col), dtype=np.float64)
                if len(vals):
                    vmin, vmax = float(vals.min()), float(vals.max())
                    s = float(vals.sum())
                    ss = float(np.dot(vals, vals))
                    td = TDigest()
                    td.add(vals)
                    td_blob = td.to_bytes()
                    hll.add(vals)
            elif is_str:
                vals = pc.drop_null(col)
                if len(vals):
                    vmin = str(pc.min(vals).as_py())
                    vmax = str(pc.max(vals).as_py())
                    hll.add(np.asarray(vals, dtype=object))
            elif pa.types.is_binary(dtype) or pa.types.is_large_binary(dtype):
                sizes = pc.binary_length(pc.drop_null(col))
                if len(sizes):
                    vmin = float(pc.min(sizes).as_py())
                    vmax = float(pc.max(sizes).as_py())
                    s = float(pc.sum(sizes).as_py())

            rows.append(
                {
                    "column": name,
                    "n": n,
                    "nulls": nulls,
                    "min_num": vmin if not isinstance(vmin, str) else None,
                    "max_num": vmax if not isinstance(vmax, str) else None,
                    "min_str": vmin if isinstance(vmin, str) else None,
                    "max_str": vmax if isinstance(vmax, str) else None,
                    "sum": s,
                    "sumsq": ss,
                    "hll": hll.to_bytes(),
                    "tdigest": td_blob,
                }
            )
        return pa.Table.from_pylist(rows, schema=_PARTIAL_SCHEMA)


_PARTIAL_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("n", pa.int64()),
        ("nulls", pa.int64()),
        ("min_num", pa.float64()),
        ("max_num", pa.float64()),
        ("min_str", pa.string()),
        ("max_str", pa.string()),
        ("sum", pa.float64()),
        ("sumsq", pa.float64()),
        ("hll", pa.binary()),
        ("tdigest", pa.binary()),
    ]
)


def _merge_partials(df) -> dict:
    hll = HyperLogLog(p=12)
    td: Optional[TDigest] = None
    for blob in df["hll"]:
        if blob:
            hll = hll.merge(HyperLogLog.from_bytes(blob))
    for blob in df["tdigest"]:
        if blob:
            t = TDigest.from_bytes(blob)
            td = t if td is None else td.merge(t)
    n = int(df["n"].sum())
    nulls = int(df["nulls"].sum())
    valid = n - nulls
    mean = float(df["sum"].sum()) / valid if valid else None
    var = None
    numeric = df["min_num"].notna().any()
    if valid and numeric:  # all-zeros columns still get std=0.0
        var = max(0.0, float(df["sumsq"].sum()) / valid - mean * mean)
    out = {
        "count": n,
        "nulls": nulls,
        "null_ratio": nulls / n if n else 0.0,
        "distinct_estimate": float(hll.estimate()) if valid else 0.0,
        "min": _coalesce(
            _first_non_null(df, "min_num", min), _first_non_null(df, "min_str", min)
        ),
        "max": _coalesce(
            _first_non_null(df, "max_num", max), _first_non_null(df, "max_str", max)
        ),
        "mean": mean,
        "std": float(np.sqrt(var)) if var is not None else None,
    }
    if td is not None:
        out.update(
            {
                "p50": td.quantile(0.5),
                "p95": td.quantile(0.95),
                "p99": td.quantile(0.99),
            }
        )
    return out


def _coalesce(a, b):
    """First non-None (unlike ``or``, keeps falsy-but-valid 0.0 / "")."""
    return a if a is not None else b


def _first_non_null(df, col, reducer):
    vals = [v for v in df[col] if v is not None and not (isinstance(v, float) and np.isnan(v))]
    return reducer(vals) if vals else None


def column_stats(ds, columns: Optional[list[str]] = None) -> dict:
    """Full-dataset column statistics. One streaming pass; result is a
    small dict per column (driver-sized by construction)."""
    columns = columns or [n for n in ds.schema().names if n != PARTITION_COLUMN]
    parts = ds.map_batches(
        _StatsPartial(columns), batch_format="pyarrow"
    ).to_pandas()
    return {
        name: _merge_partials(parts[parts["column"] == name])
        for name in columns
        if (parts["column"] == name).any()
    }


# --- drift -----------------------------------------------------------------


class _DriftPartial:
    """Per-batch, per-partition histogram partials for one drift rule."""

    def __init__(self, rule: DriftRule) -> None:
        self.rule = rule

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = self.rule
        if r.column not in batch.column_names:
            return pa.table(
                {"partition_id": pa.array([], pa.int32()),
                 "counts": pa.array([], pa.list_(pa.int64()))}
            )
        vals = np.asarray(
            pc.fill_null(pc.cast(batch.column(r.column), pa.float64()), np.nan)
        )
        if PARTITION_COLUMN in batch.column_names:
            parts = np.asarray(batch.column(PARTITION_COLUMN).combine_chunks().cast(pa.int32()))
        else:
            parts = np.full(len(vals), -1, np.int32)
        out_pid, out_counts = [], []
        for pid in np.unique(parts):
            hist = Histogram(r.lo, r.hi, r.bins)
            hist.add(vals[parts == pid])
            out_pid.append(int(pid))
            out_counts.append(hist.counts.tolist())
        return pa.table(
            {"partition_id": pa.array(out_pid, pa.int32()),
             "counts": pa.array(out_counts, pa.list_(pa.int64()))}
        )


def _per_partition_histograms(ds, rule: DriftRule) -> dict[int, Histogram]:
    """One pass → per-partition merged histograms. The materialized data
    is ``num_partitions × (bins+2)`` int64s, driver-sized even at
    thousands of partitions."""
    parts = ds.map_batches(_DriftPartial(rule), batch_format="pyarrow").to_pandas()
    merged: dict[int, Histogram] = {}
    for pid, counts in zip(parts["partition_id"], parts["counts"]):
        h = Histogram(rule.lo, rule.hi, rule.bins)
        h.counts = np.asarray(counts, dtype=np.int64)
        if pid in merged:
            merged[pid] = merged[pid].merge(h)
        else:
            merged[pid] = h
    return merged


def drift_check(ds, rule: DriftRule, baseline: Histogram):
    """Per-partition KS/PSI vs baseline → (violations_table, metrics)."""
    return _drift_verdicts(_per_partition_histograms(ds, rule), rule, baseline)


def drift_self_check(
    ds, rule: DriftRule, baseline: Optional[Histogram] = None,
    return_sketches: bool = False,
):
    """Single-pass drift: per-partition histograms computed once; the
    baseline (when not given) is their merge — each partition is compared
    against the global distribution without a second read.

    ``return_sketches=True`` additionally returns the per-partition
    histogram blobs (``{pid: bytes}``) — the mergeable sketch state the
    run manifest checkpoints (north_star lineage requirement)."""
    merged = _per_partition_histograms(ds, rule)
    if baseline is None:
        baseline = Histogram(rule.lo, rule.hi, rule.bins)
        for h in merged.values():
            baseline = baseline.merge(h)
    violations, metrics = _drift_verdicts(merged, rule, baseline)
    if return_sketches:
        return violations, metrics, {pid: h.to_bytes() for pid, h in merged.items()}
    return violations, metrics


def _drift_verdicts(merged: dict[int, Histogram], rule: DriftRule, baseline: Histogram):
    v_parts, v_reasons = [], []
    metrics = {}
    for pid, hist in sorted(merged.items()):
        ks = ks_statistic(hist, baseline)
        p = psi(hist, baseline)
        metrics[int(pid)] = {"ks": ks, "psi": p, "rows": hist.total()}
        if ks > rule.max_ks:
            v_parts.append(pid)
            v_reasons.append(
                f"distribution drift: ks={ks:.4f} exceeds max_ks={rule.max_ks}"
            )
        elif p > rule.max_psi:
            v_parts.append(pid)
            v_reasons.append(f"distribution drift: psi={p:.4f} exceeds max_psi={rule.max_psi}")

    violations = pa.Table.from_arrays(
        [
            pa.array(np.asarray(v_parts, dtype=np.int32)),
            pa.array([None] * len(v_parts), pa.string()),
            pa.array([rule.rule_id] * len(v_parts), pa.string()),
            pa.array(v_reasons, pa.string()),
        ],
        schema=VIOLATION_SCHEMA,
    )
    return violations, metrics


def compute_histogram(ds, column: str, lo: float, hi: float, bins: int = 64) -> Histogram:
    """Build a baseline histogram from a reference dataset (one pass)."""
    rule = DriftRule(rule_id="__baseline__", column=column, lo=lo, hi=hi, bins=bins)
    parts = ds.map_batches(_DriftPartial(rule), batch_format="pyarrow").to_pandas()
    out = Histogram(lo, hi, bins)
    for counts in parts["counts"]:
        h = Histogram(lo, hi, bins)
        h.counts = np.asarray(counts, dtype=np.int64)
        out = out.merge(h)
    return out


def schema_drift(ds_a, ds_b):
    """Schema + null-profile drift between two dataset snapshots — the
    table-level companion to the per-value drift gates (KS/PSI above)
    and the reference's declared-schema check (a column that vanished or
    changed type is a schema violation BEFORE any row rule runs).

    Per column of either schema, one row: ``(column, status, dtype_a,
    dtype_b, n_a, n_b, nulls_a, nulls_b)`` with status ∈ ``added``
    (B only) / ``removed`` (A only) / ``type_changed`` / ``common``.
    Schemas are driver metadata (no data pass); counts come from ONE
    pre-aggregated pass per side: each block emits a tiny (column, n,
    nulls) partial via Arrow's O(1) ``null_count``, reduced by a
    KB-size ``groupby().sum()`` — never a full-column shuffle. The
    final join runs on the driver over ≤|schema| rows."""
    import ray.data

    def side_counts(ds):
        schema = ds.schema()
        names = list(schema.names)
        types = {n: str(t) for n, t in zip(schema.names, schema.types)}

        def partial(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "column": pa.array(names, pa.string()),
                    "n": pa.array([t.num_rows] * len(names), pa.int64()),
                    "nulls": pa.array(
                        [t.column(c).null_count for c in names], pa.int64()
                    ),
                }
            )

        agg = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("column")
            .sum(["n", "nulls"])
            .to_pandas()
        )
        out = {
            r["column"]: (int(r["sum(n)"]), int(r["sum(nulls)"]))
            for _, r in agg.iterrows()
        }
        # empty dataset: no blocks → no partials; report 0s
        return types, {n: out.get(n, (0, 0)) for n in names}

    types_a, counts_a = side_counts(ds_a)
    types_b, counts_b = side_counts(ds_b)

    rows = []
    for col in sorted(set(types_a) | set(types_b)):
        in_a, in_b = col in types_a, col in types_b
        if in_a and in_b:
            status = "common" if types_a[col] == types_b[col] else "type_changed"
        else:
            status = "removed" if in_a else "added"
        na, za = counts_a.get(col, (None, None))
        nb, zb = counts_b.get(col, (None, None))
        rows.append(
            {
                "column": col,
                "status": status,
                "dtype_a": types_a.get(col),
                "dtype_b": types_b.get(col),
                "n_a": na,
                "n_b": nb,
                "nulls_a": za,
                "nulls_b": zb,
            }
        )
    schema = pa.schema(
        [
            ("column", pa.string()),
            ("status", pa.string()),
            ("dtype_a", pa.string()),
            ("dtype_b", pa.string()),
            ("n_a", pa.int64()),
            ("n_b", pa.int64()),
            ("nulls_a", pa.int64()),
            ("nulls_b", pa.int64()),
        ]
    )
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


def psi_by_group(
    ds,
    group_column: str,
    value_column: str,
    width: int,
    n_bins: int,
    eps: float = 1e-6,
):
    """Population Stability Index of each group's value distribution vs
    the GLOBAL distribution, over fixed-width integer bins
    ``bin = min(value // width, n_bins - 1)`` — the oracle-checkable
    closed form of the per-partition drift gate
    (``drift_self_check`` / ``state.sketches.psi``; same ``eps`` floor
    on both ratios so empty bins contribute finitely).

    Plan: one combiner ``group_sum`` to the tiny ``(group, bin)`` count
    grid, the global n_bins distribution folded on the driver (KBs) and
    broadcast in the closure, then per-group PSI vectorized inside one
    ``map_groups`` over the grid. Output: ``group, psi6`` (ROUND(·,6)).
    """
    import pyarrow.compute as pc

    from fs_schema_validator_ray.stages.agg import group_sum

    def binned(t: pa.Table) -> pa.Table:
        b = pc.min_element_wise(
            pc.divide(pc.cast(t.column(value_column), pa.int64()), width),
            n_bins - 1,
        )
        return pa.table({group_column: t.column(group_column), "bin": b})

    counts = group_sum(
        ds.select_columns([group_column, value_column]).map_batches(
            binned, batch_format="pyarrow"
        ),
        [group_column, "bin"],
        [],
    )

    # fold the global per-bin distribution on the driver (n_bins ints)
    g = np.zeros(n_bins, np.int64)
    for b in counts.iter_batches(batch_format="pyarrow"):
        np.add.at(
            g,
            np.asarray(b.column("bin"), dtype=np.int64),
            np.asarray(b.column("n"), dtype=np.int64),
        )
    q = np.maximum(g / max(int(g.sum()), 1), eps)

    def per_group(grp: pa.Table) -> pa.Table:
        if grp.num_rows == 0:
            return pa.table(
                {group_column: grp.column(group_column).slice(0, 0),
                 "psi6": pa.array([], pa.float64())}
            )
        cnt = np.zeros(n_bins, np.int64)
        cnt[np.asarray(grp.column("bin"), dtype=np.int64)] = np.asarray(
            grp.column("n"), dtype=np.int64
        )
        p = np.maximum(cnt / max(int(cnt.sum()), 1), eps)
        val = float(np.sum((p - q) * np.log(p / q)))
        return pa.table(
            {
                group_column: grp.column(group_column).slice(0, 1),
                "psi6": pa.array([round(val, 6)], pa.float64()),
            }
        )

    return counts.groupby(group_column).map_groups(per_group, batch_format="pyarrow")


# --- categorical drift (round 5) ---------------------------------------------


class _CatDriftPartial:
    """Per-batch per-partition CATEGORY counts for one categorical drift
    rule (Arrow value_counts per partition — no per-row Python)."""

    def __init__(self, rule: DriftRule) -> None:
        self.rule = rule

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = self.rule
        empty = pa.table(
            {
                "partition_id": pa.array([], pa.int32()),
                "category": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
        if r.column not in batch.column_names:
            return empty
        cats = pc.cast(batch.column(r.column).combine_chunks(), pa.string())
        cats = pc.fill_null(cats, "__null")
        if PARTITION_COLUMN in batch.column_names:
            parts = np.asarray(
                batch.column(PARTITION_COLUMN).combine_chunks().cast(pa.int32())
            )
        else:
            parts = np.full(len(cats), -1, np.int32)
        tbl = pa.table(
            {"partition_id": pa.array(parts), "category": cats}
        )
        g = pa.TableGroupBy(tbl, ["partition_id", "category"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "partition_id": g.column("partition_id"),
                "category": g.column("category"),
                "n": pc.cast(g.column("count_all"), pa.int64()),
            }
        )


def categorical_drift_self_check(
    ds,
    rule: DriftRule,
    baseline: dict[str, int] | None = None,
    return_sketches: bool = False,
):
    """Per-partition categorical PSI vs the baseline (default: the merge
    of all partitions — single pass, same convention as
    :func:`drift_self_check`). Categories beyond ``rule.top_k`` by
    GLOBAL frequency lump into ``__other`` on BOTH sides (bounded state
    at any cardinality); PSI uses the repo's eps=1e-6 floor. Returns
    ``(violations_table, {pid: {"psi": ...}}, [sketches])`` where the
    sketch blobs are the JSON category-count dicts the run manifest
    checkpoints."""
    import json as _json

    parts = ds.map_batches(_CatDriftPartial(rule), batch_format="pyarrow").to_pandas()
    per_pid: dict[int, dict[str, int]] = {}
    for pid, cat, n in zip(
        parts["partition_id"], parts["category"], parts["n"]
    ):
        per_pid.setdefault(int(pid), {})
        per_pid[int(pid)][cat] = per_pid[int(pid)].get(cat, 0) + int(n)

    if baseline is None:
        base: dict[str, int] = {}
        for d in per_pid.values():
            for c, n in d.items():
                base[c] = base.get(c, 0) + n
    else:
        base = dict(baseline)

    # global top-k category space, everything else lumps into __other
    keep = set(
        sorted(base, key=lambda c: (-base[c], c))[: max(1, rule.top_k)]
    )

    def lump(d: dict[str, int]) -> np.ndarray:
        cats = sorted(keep) + ["__other"]
        out = np.zeros(len(cats), np.float64)
        idx = {c: i for i, c in enumerate(cats)}
        for c, n in d.items():
            out[idx.get(c, len(cats) - 1)] += n
        return out

    base_v = lump(base)
    base_p = np.maximum(base_v / max(base_v.sum(), 1.0), 1e-6)

    v_parts, v_reasons = [], []
    metrics: dict[int, dict] = {}
    for pid, d in sorted(per_pid.items()):
        v = lump(d)
        p = np.maximum(v / max(v.sum(), 1.0), 1e-6)
        psi_val = float(np.sum((p - base_p) * np.log(p / base_p)))
        metrics[pid] = {"psi": round(psi_val, 6), "n": int(v.sum())}
        if psi_val > rule.max_psi:
            v_parts.append(pid)
            v_reasons.append(
                f"categorical drift: psi={psi_val:.4f} exceeds "
                f"max_psi={rule.max_psi}"
            )
    viol = pa.Table.from_arrays(
        [
            pa.array(np.asarray(v_parts, np.int32)),
            pa.array([None] * len(v_parts), pa.string()),
            pa.array([rule.rule_id] * len(v_parts), pa.string()),
            pa.array(v_reasons, pa.string()),
        ],
        schema=VIOLATION_SCHEMA,
    )
    if return_sketches:
        sk = {
            pid: _json.dumps(d, sort_keys=True).encode() for pid, d in per_pid.items()
        }
        return viol, metrics, sk
    return viol, metrics
