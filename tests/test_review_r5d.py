"""Round-5 review batch 10 pins: null/empty-embedding safety across the
similarity query builders, and NULL-text simhash semantics.

Defect class: every top-k builder inferred the vector dimensionality
with ``queries.select(vec_col).first()[0]`` — a TypeError on an empty
query frame and a ``len(None)`` crash when the FIRST row's embedding is
NULL; ``cosine_topk``'s pandas scorer additionally crashed inside the
executor on any NULL corpus embedding (``np.array(list(...))`` over a
None). Failed-encoder rows are a fact of web-scale embedding tables:
the trainers already filtered them, the query builders didn't.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from parquet_go_spark.ops.dedup import simhash64
from parquet_go_spark.ops.similarity import (
    cosine_topk,
    embedding_near_dups,
    ivf_topk,
    lsh_bucket_topk,
    pq_topk,
)


def _corpus(spark, n=40, dim=16, null_ids=()):
    rows = []
    for i in range(n):
        if i in null_ids:
            rows.append((i, None))
        else:
            rows.append((i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(dim)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.mark.parametrize("fn", [cosine_topk, ivf_topk, pq_topk, lsh_bucket_topk])
def test_topk_empty_queries_returns_empty(spark, fn):
    corpus = _corpus(spark)
    empty_q = corpus.limit(0)
    out = fn(corpus, empty_q, k=3)
    assert out.columns == ["q_id", "n_id", "rank"]
    assert out.count() == 0


@pytest.mark.parametrize("fn", [cosine_topk, ivf_topk, pq_topk, lsh_bucket_topk])
def test_topk_all_null_queries_returns_empty(spark, fn):
    corpus = _corpus(spark)
    null_q = spark.createDataFrame(
        [(900, None), (901, None)], "vec_id long, embedding array<double>"
    )
    out = fn(corpus, null_q, k=3)
    assert out.count() == 0


def test_topk_null_first_query_vector_still_works(spark):
    """dim inference must skip NULL rows, not crash on the first one."""
    corpus = _corpus(spark, n=30)
    q = spark.createDataFrame(
        [(900, None), (901, [1.0] * 16)], "vec_id long, embedding array<double>"
    ).orderBy("vec_id")
    for fn in (cosine_topk, ivf_topk, pq_topk, lsh_bucket_topk):
        out = fn(corpus, q, k=3).toPandas()
        assert set(out["q_id"]) <= {901}


def test_cosine_topk_null_corpus_rows_skipped_not_fatal(spark):
    """A NULL corpus embedding drops that row; results over the rest
    match the same query run on the pre-filtered corpus."""
    dirty = _corpus(spark, n=40, null_ids=(3, 17))
    clean = dirty.where(F.col("embedding").isNotNull())
    q = clean.where(F.col("vec_id") < 2)
    got = cosine_topk(dirty, q, k=5).toPandas().sort_values(["q_id", "rank"])
    want = cosine_topk(clean, q, k=5).toPandas().sort_values(["q_id", "rank"])
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_embedding_near_dups_empty_and_all_null_corpus(spark):
    empty = _corpus(spark).limit(0)
    out = embedding_near_dups(empty)
    assert out.columns == ["id_a", "id_b", "sim"]
    assert out.count() == 0
    all_null = spark.createDataFrame(
        [(0, None), (1, None)], "vec_id long, embedding array<double>"
    )
    assert embedding_near_dups(all_null).count() == 0


def test_embedding_near_dups_null_first_vector_uses_later_dim(spark):
    rows = [(0, None)] + [
        (i, [1.0 + (0.001 * i if j == 0 else 0.0) for j in range(8)]) for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_near_dups(df, threshold=0.9).toPandas()
    # the five near-identical vectors pair up; the null row pairs with nothing
    assert len(out) == 10
    assert 0 not in set(out["id_a"]) | set(out["id_b"])


def test_simhash_null_text_is_null_not_zero(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, None), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    assert out[1] is None and out[2] is None
    # real text (including empty string) keeps a concrete signature
    assert out[0] is not None and out[3] is not None


# ---- simhash_near_dups: the pairing operator the simhash family lacked


def _shd_corpus(spark):
    """Texts with graded word overlap so simhash hamming distances span
    0..far; small enough for an exact all-pairs brute force."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [(0, base), (1, base)]  # identical: hamming 0
    words = base.split()
    for i in range(2, 30):
        mut = list(words)
        for j in range(i % 5):
            mut[j] = f"sub{i}_{j}"
        rows.append((i, " ".join(mut)))
    rows.append((30, None))  # NULL text must pair with nothing
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_near_dups_matches_all_pairs_brute_force(spark):
    """Banding guarantees EXACT recall (any pair within hamming t shares
    a block), so with no capped buckets the operator must equal the
    all-pairs brute force over the same signatures."""
    from parquet_go_spark.ops.dedup import simhash64, simhash_near_dups

    df = _shd_corpus(spark)
    sigs = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    want = set()
    ids = [i for i, s in sigs.items() if s is not None]
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sorted((ids[x], ids[y]))
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= 3:
                want.add((a, b, h))
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_near_dups(df, max_bucket=100_000).collect()
    }
    assert got == want and (0, 1, 0) in got
    assert not any(30 in (a, b) for a, b, _ in got)


def test_simhash_near_dups_hot_bucket_cap_engages(spark):
    """60 identical docs share every block value: uncapped that is one
    C(60,2) bomb; capped, zero hot pairs survive while a planted
    identical pair in a cold bucket still does."""
    from parquet_go_spark.ops.dedup import simhash_near_dups

    hot = [(i, "the same boilerplate page text repeated verbatim everywhere") for i in range(60)]
    planted = [
        (100, "one two three four five six seven eight nine ten eleven twelve"),
        (101, "one two three four five six seven eight nine ten eleven twelve"),
    ]
    filler = [
        (200 + i, f"totally unrelated document number {i} with words w{i} x{i} y{i} z{i} q{i}")
        for i in range(20)
    ]
    df = spark.createDataFrame(hot + planted + filler, "doc_id long, text string")
    uncapped = simhash_near_dups(df, max_bucket=100_000).collect()
    assert len([r for r in uncapped if r.id_a < 60 and r.id_b < 60]) == 60 * 59 // 2

    capped = simhash_near_dups(df, max_bucket=16).collect()
    assert not any(r.id_a < 60 and r.id_b < 60 for r in capped)
    assert any((r.id_a, r.id_b) == (100, 101) for r in capped)


# ---- non-identifier column names (batch-5's finding class, swept repo-wide)


def test_ops_accept_non_identifier_column_names(spark):
    """Batch 5 backtick-quoted ops/text.py's SQL interpolations but the
    same hazard lived on in curate/dedup/similarity/winnow (f-string
    column names inside F.expr) and in dotted struct-field access
    (F.col("__s.{id}") breaks on any name a dotted path can't express).
    Every pipeline op must accept a column named like "text body" /
    "doc id". (Names containing literal DOTS follow Spark's own F.col
    convention — the caller passes them pre-backticked — so they are
    not exercised here.)"""
    from parquet_go_spark.ops.cluster import canonical_docs, dup_clusters
    from parquet_go_spark.ops.curate import curate_corpus, curate_corpus_rows
    from parquet_go_spark.ops.dedup import (
        exact_dedup,
        lsh_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
        simhash64,
        simhash_near_dups,
    )
    from parquet_go_spark.ops.winnow import winnowing_fingerprints

    rows = [(i, f"some words w{i % 3} and more text here", "en") for i in range(12)]
    rows.append((12, None, "en"))
    df = (
        spark.createDataFrame(rows, "doc_id long, text string, lang string")
        .withColumnRenamed("doc_id", "doc id")
        .withColumnRenamed("text", "text body")
        .withColumnRenamed("lang", "lang col")
    )
    kw = dict(text_col="text body", id_col="doc id")
    assert exact_dedup(df, **kw).count() > 0
    assert minhash_signatures(df, **kw).count() == 13
    lsh_pairs(df, **kw).count()
    ngram_jaccard_pairs(df, **kw).count()
    assert simhash64(df, **kw).count() == 13
    simhash_near_dups(df, **kw).count()
    assert winnowing_fingerprints(df, **kw).count() >= 0
    assert curate_corpus(df, lang_col="lang col", **kw).count() > 0
    assert curate_corpus_rows(df, **kw).count() > 0
    pairs = spark.createDataFrame([(0, 3), (3, 6)], "id_a long, id_b long")
    cl = dup_clusters(df, pairs, id_col="doc id")
    assert cl.count() == 13
    assert canonical_docs(df, cl, id_col="doc id", text_col="text body").count() > 0


def test_similarity_accepts_non_identifier_column_names(spark):
    from parquet_go_spark.ops.similarity import (
        cosine_topk,
        embedding_near_dups,
        ivf_topk,
        lsh_bucket_topk,
        pq_topk,
        train_ivf_kmeans,
        train_pq_kmeans,
    )

    rows = [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(16)]) for i in range(24)]
    df = (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        .withColumnRenamed("vec_id", "vec id")
        .withColumnRenamed("embedding", "embedding vec")
    )
    kw = dict(id_col="vec id", vec_col="embedding vec")
    q = df.where(F.col("`vec id`") < 2)
    for fn in (cosine_topk, ivf_topk, pq_topk, lsh_bucket_topk):
        assert fn(df, q, k=3, **kw).count() > 0, fn.__name__
    assert embedding_near_dups(df, threshold=-1.0, **kw).count() > 0
    assert train_ivf_kmeans(df, n_cells=2, vec_col="embedding vec").shape == (16, 2)
    assert train_pq_kmeans(df, m=2, n_codes=2, vec_col="embedding vec").shape == (2, 8, 2)


# ---- multimodal: NULL content / NULL meta survive every modality


def test_multimodal_null_content_and_meta_survive(spark):
    """Batch-2 coerced NULL image metadata but the audio/video paths
    kept the crash class: a NULL sample_rate/duration_ms row was a
    TypeError (None * None) inside the executor, a NULL content row a
    TypeError at the magic-byte sniff, and a NULL meta STRUCT a
    subscript on None — each killing the whole job over one bad row.
    Every modality must featurize a table where any of content, meta,
    or individual meta fields are NULL, and one feature dimension must
    hold across the image rows."""
    import pandas as pd

    from parquet_go_spark.ops.multimodal import audio_features, image_features, video_frame_sample

    rows = [
        # (media_id, kind, content, meta)
        (0, "image", b"\x01\x02\x03" * 64, (32, 24, 3, None, None, "fake")),
        (1, "image", None, (32, 24, 3, None, None, "fake")),
        (2, "image", b"\x04" * 64, None),
        (3, "image", b"\x05" * 64, (None, None, None, None, None, None)),
        (4, "audio", b"\x06" * 256, (None, None, None, 8000, 500, "fake")),
        (5, "audio", None, (None, None, None, None, None, None)),
        (6, "audio", b"\x07" * 256, None),
        (7, "video", b"\x08" * 512, (None, None, None, None, 3000, "fake")),
        (8, "video", None, None),
    ]
    from parquet_go_spark.ops.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    imgs = image_features(df).collect()
    assert sorted(r["media_id"] for r in imgs) == [0, 1, 2, 3]
    assert len({len(r["feature"]) for r in imgs}) == 1  # one dimension
    auds = audio_features(df).collect()
    assert sorted(r["media_id"] for r in auds) == [4, 5, 6]
    assert all(len(r["feature"]) == 32 for r in auds)
    vids = video_frame_sample(df).collect()
    assert {r["media_id"] for r in vids} == {7, 8}


def test_multimodal_forged_metadata_is_capped():
    """The fake paths allocate from metadata alone: a forged row
    declaring absurd dims must be bounded, not an OOM."""
    from parquet_go_spark.ops.multimodal import (
        _codec_audio_decode,
        _codec_image_decode,
        _codec_video_keyframes,
    )

    img = _codec_image_decode(b"x", 10**9, 10**9, 10**6)
    assert img.shape == (8192, 8192, 64)[:0] or img.shape[0] <= 8192 and img.shape[1] <= 8192 and img.shape[2] <= 64
    pcm = _codec_audio_decode(b"x", 10**9, 10**9)
    assert len(pcm) <= 100_000_000
    frames = _codec_video_keyframes(b"x" * 100, 10**12, 1)
    assert len(frames) <= 100_000


def test_dup_clusters_survives_composed_detector_pairs(spark):
    """Regression: when ``pairs`` unions two detectors over the SAME
    docs frame (lsh_pairs ∪ simhash_near_dups — the normal composed
    pipeline), the pointer-jumping loop's hop self-join used to trip a
    Catalyst relation-dedup rewrite at localCheckpoint (internal
    NoSuchElementException: key not found: id#N) from round 1 on. The
    hop aggregate is now checkpointed BEFORE the self-join."""
    from parquet_go_spark.ops.cluster import dup_clusters
    from parquet_go_spark.ops.dedup import lsh_pairs, simhash_near_dups

    rows = []
    for i in range(40):
        rows.append((i, f"shared words w{i % 4} common here {i % 3} tail"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # a join-derived frame reproduces the attribute lineage that broke
    keep = docs.join(docs.select("doc_id"), "doc_id")
    pairs = (
        lsh_pairs(keep)
        .unionByName(simhash_near_dups(keep).select("id_a", "id_b"))
        .distinct()
    )
    out = dup_clusters(keep, pairs)
    assert out.count() == 40
    # labels are consistent: every cluster label is a member's min id
    labs = {r["cluster_id"] for r in out.collect()}
    ids = {r["doc_id"] for r in out.collect()}
    assert labs <= ids


def test_thrift_forged_collection_sizes_fail_fast():
    """Hypothesis found a 6-byte bloom 'header' declaring a 137M-entry
    bool map that spun ~38 s of zero-byte element reads before walking
    off the buffer (field-context bools consume nothing; collection
    sizes were never checked against the remaining bytes). Collection
    sizes now bound by the buffer and reject instantly, and bool
    list/set/map ELEMENTS consume one byte each per the compact
    protocol (0x01 true / 0x02 false) in both directions."""
    import time

    from parquet_go_spark.compat.bloom_filter import read_bloom_bitset
    from parquet_go_spark.compat.thrift_compact import read_struct

    t = time.time()
    with pytest.raises((ValueError, IndexError)):
        read_bloom_bitset(b"+\x90\xee\xf1A!", {14: 0, 1: 6})
    assert time.time() - t < 1.0  # was ~38 s

    # bool collection elements are one byte each
    s, _ = read_struct(bytes([0x19, (3 << 4) | 1, 1, 2, 1, 0x00]), 0)
    assert s[1] == [True, False, True]
    s2, _ = read_struct(bytes([0x1B, 2, (5 << 4) | 1, 0x00, 1, 0x02, 2, 0x00]), 0)
    assert s2[1] == {0: True, 1: False}


def test_thrift_forged_nesting_depth_fails_controlled():
    """A buffer of 0x1C (field-1/T_STRUCT) bytes recursed once per byte
    into Python's RecursionError — an uncontrolled failure the callers'
    except clauses don't cover. Depth now governs at 100 (parquet
    metadata nests ~10) with the same ValueError contract; legitimate
    nesting still parses."""
    from parquet_go_spark.compat.thrift_compact import read_struct

    with pytest.raises(ValueError, match="nesting depth"):
        read_struct(bytes([0x1C]) * 5000, 0)
    s, _ = read_struct(bytes([0x1C, 0x15, 0x06, 0x00, 0x00]), 0)
    assert s == {1: {1: 3}}
