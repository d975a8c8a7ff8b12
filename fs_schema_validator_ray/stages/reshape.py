"""Unpivot (melt) — wide → long reshape, the inverse of
``stages/agg.py::pivot_wide``.

Purely stateless: each block maps to ``len(value_columns)`` stacked
slices, no shuffle, no driver state — embarrassingly parallel at any
scale. The variable-name column is built as a dictionary array (one
distinct string, O(1) heap per block) then cast, never a Python list of
n repeated strings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def unpivot(
    ds,
    id_columns: list[str],
    value_columns: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    value_type: pa.DataType | None = None,
):
    """SQL ``UNPIVOT`` / pandas ``melt``: one output row per (input row ×
    value column), with the source column name in ``var_name`` and its
    value cast to a common ``value_type`` (default float64) in
    ``value_name``. Output column order: ``id_columns + [var_name,
    value_name]``."""
    if value_type is None:
        value_type = pa.float64()
    if not value_columns:
        raise ValueError("unpivot needs at least one value column")
    if var_name == value_name:
        raise ValueError(f"var_name and value_name collide: {var_name!r}")
    overlap = (set(id_columns) | set(value_columns)) & {var_name, value_name}
    if set(id_columns) & set(value_columns):
        raise ValueError("id_columns and value_columns overlap")
    if overlap:
        raise ValueError(f"column names collide with outputs: {sorted(overlap)}")

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        parts = []
        for c in value_columns:
            var = pc.cast(
                pa.DictionaryArray.from_arrays(
                    pa.array(np.zeros(n, np.int32)), pa.array([c], pa.string())
                ),
                pa.string(),
            )
            parts.append(
                pa.table(
                    {
                        **{ic: t.column(ic) for ic in id_columns},
                        var_name: var,
                        value_name: pc.cast(t.column(c), value_type),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.select_columns([*id_columns, *value_columns]).map_batches(
        fn, batch_format="pyarrow"
    )


def standardize_columns(ds, columns: list[str], id_columns: list[str]):
    """Z-score standardization (feature scaling): fit per-column mean /
    sample-std from ONE streaming moment pass (per-block ``(n, Σx, Σx²)``
    partials — three floats per column per block), then ONE transform
    pass emits ``z_<col> = (x − mean)/std`` per row. The fit/transform
    split mirrors ``similarity.pca_fit``/``pca_project``; the model is a
    dict of 2·len(columns) floats, broadcast by closure.

    Null inputs yield null z-scores and are excluded from the moments
    (SQL AVG/STDDEV_SAMP semantics); a constant column (std 0) yields
    null z-scores (SQL division by NULL-adjacent convention: we emit
    null rather than ±inf). Float caveat: the distributed Σx order
    differs from a serial oracle's — compare through a ROUND(·,6)
    protocol like ``group_moments``."""
    cols = list(dict.fromkeys([*id_columns, *columns]))

    def moments(t: pa.Table) -> pa.Table:
        out = {}
        for c in columns:
            col = t.column(c)
            arr = np.asarray(
                pc.fill_null(pc.cast(col, pa.float64()), 0.0), dtype=np.float64
            )
            valid = np.asarray(pc.is_valid(col))
            v = arr[valid]
            out[f"n_{c}"] = pa.array([len(v)], pa.int64())
            out[f"s_{c}"] = pa.array([float(v.sum())], pa.float64())
            out[f"ss_{c}"] = pa.array([float(np.square(v).sum())], pa.float64())
        return pa.table(out)

    parts = (
        ds.select_columns(columns)
        .map_batches(moments, batch_format="pyarrow")
        .to_pandas()
    )
    model = {}
    for c in columns:
        n = int(parts[f"n_{c}"].sum())
        s = float(parts[f"s_{c}"].sum())
        ss = float(parts[f"ss_{c}"].sum())
        if n < 2:
            raise ValueError(f"standardize_columns: column {c!r} has <2 values")
        mean = s / n
        var = max(ss - n * mean * mean, 0.0) / (n - 1)
        model[c] = (mean, float(np.sqrt(var)))

    def transform(t: pa.Table) -> pa.Table:
        out = {c: t.column(c) for c in id_columns}
        for c in columns:
            mean, std = model[c]
            col = t.column(c)
            valid = np.asarray(pc.is_valid(col))
            arr = np.asarray(
                pc.fill_null(pc.cast(col, pa.float64()), 0.0), dtype=np.float64
            )
            if std > 0.0:
                z = (arr - mean) / std
                mask = ~valid
            else:
                z = np.zeros(len(arr))
                mask = np.ones(len(arr), dtype=bool)
            out[f"z_{c}"] = pa.array(z, pa.float64(), mask=mask)
        return pa.table(out)

    return ds.select_columns(cols).map_batches(transform, batch_format="pyarrow")
