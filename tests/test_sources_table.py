"""Table source abstraction: parquet path + gated lance path."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fs_schema_validator_ray.sources.table import lance_available, read_table


def test_parquet_fallback(ray_session, tmp_path):
    p = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}), p)
    ds = read_table(str(p), columns=["a"])
    assert ds.count() == 3
    assert ds.schema().names == ["a"]


def test_lance_requires_package(tmp_path):
    if lance_available():  # pragma: no cover - not in this sandbox
        pytest.skip("lance installed; gated error not applicable")
    with pytest.raises(ImportError, match="Lance"):
        read_table(str(tmp_path / "t.lance"))
