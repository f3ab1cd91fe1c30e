"""Spark's own JVM parquet reader as a third independent engine over
``write_parquet`` output (beside pyarrow and DuckDB) — the sandbox
analogue of the reference's dockerized write-with-parquet-go /
read-with-parquet-mr harness (``compatibility/run_tests.bash``,
``compatibility/compare.go``): parquet-mr IS the library inside Spark's
scan, so ``spark.read.parquet`` over our writer's files covers the same
cross-implementation surface."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark.compat.parquet_writer import write_parquet

pytestmark = pytest.mark.spark

RNG = np.random.default_rng(11)
N = 2000
FLAT = pa.table(
    {
        "k": pa.array(np.arange(N), type=pa.int64()),
        "i32": pa.array(RNG.integers(-(2**31), 2**31, N).astype(np.int32), type=pa.int32()),
        "f64": pa.array(RNG.standard_normal(N), type=pa.float64()),
        "s": pa.array(
            [None if i % 9 == 0 else f"sv-{i % 50}-{i}" for i in range(N)], type=pa.string()
        ),
        "low": pa.array([f"v{i % 5}" for i in range(N)], type=pa.string()),
        "b": pa.array((RNG.integers(0, 2, N) == 1).tolist(), type=pa.bool_()),
    }
)
NESTED = pa.table(
    {
        "k": pa.array(np.arange(300), type=pa.int64()),
        "xs": pa.array(
            [None if i % 7 == 0 else list(range(i % 5)) for i in range(300)],
            type=pa.list_(pa.int32()),
        ),
        "st": pa.array(
            [{"a": i, "b": f"t{i % 3}"} if i % 4 else None for i in range(300)],
            type=pa.struct([("a", pa.int64()), ("b", pa.string())]),
        ),
        "mp": pa.array(
            [{f"m{i % 3}": float(i)} for i in range(300)],
            type=pa.map_(pa.string(), pa.float64()),
        ),
    }
)


def _spark_readback_equal(spark, tmp_path, buf: bytes, t: pa.Table, name: str) -> None:
    p = tmp_path / f"{name}.parquet"
    p.write_bytes(buf)
    got = spark.read.parquet(str(p)).orderBy("k").toPandas()
    want = t.to_pandas().sort_values("k").reset_index(drop=True)
    assert len(got) == len(want)
    for c in t.column_names:
        g, w = got[c], want[c]
        if t.column(c).type in (pa.float64(), pa.float32()):
            assert g.to_numpy().tobytes() == w.to_numpy().tobytes(), c
        elif pa.types.is_map(t.column(c).type):
            # spark returns dicts, pyarrow lists of kv tuples
            assert [sorted(x or []) for x in w] == [
                sorted((x or {}).items()) for x in g
            ], c
        elif pa.types.is_struct(t.column(c).type):
            norm = [None if x is None else tuple(x.values()) for x in w]
            sp = [
                None
                if x is None
                else tuple((x.asDict() if hasattr(x, "asDict") else dict(x)).values())
                for x in g
            ]
            assert norm == sp, c
        elif pa.types.is_list(t.column(c).type):
            assert [None if x is None else list(x) for x in w] == [
                None if x is None else list(x) for x in g
            ], c
        else:
            assert g.where(g.notna(), None).tolist() == w.where(w.notna(), None).tolist(), c


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.parametrize("comp", ["none", "snappy", "zstd", "gzip"])
def test_jvm_reads_flat_matrix(spark, tmp_path, version, comp):
    buf = write_parquet(FLAT, compression=comp, file_version=version)
    _spark_readback_equal(spark, tmp_path, buf, FLAT, f"flat_v{version}_{comp}")


def test_jvm_reads_forced_encodings(spark, tmp_path):
    buf = write_parquet(
        FLAT,
        encodings={"i32": "delta_bp", "s": "delta_bytes", "low": "delta_length"},
        max_page=4096,
    )
    _spark_readback_equal(spark, tmp_path, buf, FLAT, "forced")


@pytest.mark.parametrize("version", [1, 2])
def test_jvm_reads_nested(spark, tmp_path, version):
    buf = write_parquet(NESTED, compression="snappy", file_version=version)
    _spark_readback_equal(spark, tmp_path, buf, NESTED, f"nested_v{version}")


def test_jvm_reads_prune_structures_file(spark, tmp_path):
    """Bloom filters + page index in the footer must not confuse the
    JVM reader (it validates offsets strictly)."""
    buf = write_parquet(FLAT, page_index=True, bloom_columns=["s", "k"], max_page=4096)
    _spark_readback_equal(spark, tmp_path, buf, FLAT, "pruned")
