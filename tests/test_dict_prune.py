"""Dictionary-membership pruning on the native container: a ``rle_dict``
chunk's dictionary page is its exact distinct set (every non-null value
routes through it), so an ``==``/``IN`` probe that misses the dictionary
excludes the partition with zero false positives — where min/max bounds
cannot (value inside the range) and blooms are opt-in and probabilistic.
parquet-mr DictionaryFilter semantics (already on the parquet interop
side, ``compat/dict_filter.py``) applied to pgs tables."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from parquet_go_spark.core.chunk import chunk_dict_values, encode_chunk
from parquet_go_spark.core.columns import from_arrow

pytestmark = pytest.mark.spark


def _chunk(values, encoding="rle_dict"):
    import pyarrow as pa

    col = from_arrow(pa.chunked_array([pa.array(values)]).combine_chunks())
    blob, _ = encode_chunk(col, encoding=encoding)
    return blob


def test_chunk_dict_values_reads_exact_set():
    blob = _chunk(["aa", "cc", "aa", None, "cc"])
    assert chunk_dict_values(blob) == {b"aa", b"cc"}
    # non-dict chunks carry no proof
    assert chunk_dict_values(_chunk(["aa", "bb"], encoding="plain")) is None
    # all-null dict chunk: empty exact set (nothing can match ==)
    import pyarrow as pa

    col = from_arrow(pa.array([None, None], type=pa.string()))
    blob, _ = encode_chunk(col, profile="reference")
    assert chunk_dict_values(blob) == set()


def test_chunk_dict_values_numeric():
    blob = _chunk([10, 20, 10, 30])
    assert chunk_dict_values(blob) == {10, 20, 30}


@pytest.fixture(scope="module")
def dict_table(spark, tmp_path_factory):
    """Two partitions keyed on a low-cardinality column whose per-
    partition value sets interleave lexicographically: min/max bounds
    span the probe value, so any partition skip is the dictionary's."""
    from parquet_go_spark.spark.encode_job import encode_table

    d = str(tmp_path_factory.mktemp("dictprune") / "enc")
    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("aa"), F.lit("cc"), F.lit("bb"), F.lit("dd")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("grp"),
        F.concat(F.lit("payload-"), F.col("id")).alias("text"),
    )
    # key on grp so each partition owns a subset of the 4 values
    encode_table(df, d, key_col="grp", partitions=2, encodings={"grp": "rle_dict"}).collect()
    return d, df


def _grp_sets(spark, d):
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import _read_chunk_dict

    return {
        pid: _read_chunk_dict(d, pid, "grp") for pid in sorted(mf.committed_partitions(d))
    }


def test_dict_probe_prunes_inside_minmax_range(spark, dict_table):
    """A probe value lexicographically inside a partition's [min, max]
    but absent from its dictionary drops that partition."""
    from parquet_go_spark.spark.decode_job import surviving_partitions

    d, _ = dict_table
    sets = _grp_sets(spark, d)
    assert all(s is not None for s in sets.values())
    # pick a present value and find a partition that does NOT hold it but
    # whose neighbors' values straddle it (hash partitioning on 4 values
    # into 2 partitions guarantees a 2/2 or 3/1 split)
    all_vals = sorted(set().union(*sets.values()))
    assert len(all_vals) == 4
    probed = None
    for v in all_vals:
        holders = [pid for pid, s in sets.items() if v in s]
        missers = [pid for pid, s in sets.items() if v not in s]
        if holders and missers:
            probed = (v.decode(), holders, missers)
            break
    assert probed is not None, "all partitions hold all values — rekey the fixture"
    val, holders, missers = probed
    keep = surviving_partitions(d, [("grp", "==", val)])
    assert set(keep) == set(holders), f"dict probe kept {keep}, expected {holders}"


def test_dict_probe_absent_value_prunes_everything(spark, dict_table):
    from parquet_go_spark.spark.decode_job import surviving_partitions

    d, _ = dict_table
    # 'ab' sorts inside [aa, dd]: min/max cannot exclude it anywhere,
    # there are no blooms — only the dictionary proves absence
    assert surviving_partitions(d, [("grp", "==", "ab")]) == []
    # IN: all members absent -> pruned; any member present -> kept
    assert surviving_partitions(d, [("grp", "in", ["ab", "ba"])]) == []
    assert len(surviving_partitions(d, [("grp", "in", ["ab", "cc"])])) >= 1


def test_dict_pruned_decode_stays_exact(spark, dict_table):
    """The full read path with a dict-pruned predicate returns exactly
    the matching rows (prune is a skip-proof, never a filter)."""
    from parquet_go_spark.spark.decode_job import decode_table

    d, df = dict_table
    got = decode_table(spark, d, prune=[("grp", "==", "cc")]).filter(F.col("grp") == "cc")
    assert got.count() == df.filter(F.col("grp") == "cc").count()
    assert decode_table(spark, d, prune=[("grp", "==", "ab")]).filter(
        F.col("grp") == "ab"
    ).count() == 0
