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
