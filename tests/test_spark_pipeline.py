"""End-to-end Spark pipeline tests (SURVEY.md §7 step 4/5): synthesize the
pages table -> salted repartition -> mapInPandas encode -> manifest ->
decode -> byte-identical verify; plus checkpoint/resume and column
projection."""

from __future__ import annotations

import glob
import os

import pytest

from parquet_go_spark.spark import manifest as mf
from parquet_go_spark.spark.decode_job import decode_table
from parquet_go_spark.spark.encode_job import encode_table
from parquet_go_spark.spark.pages_table import pages_df, pages_pandas
from parquet_go_spark.spark.verify import verify_roundtrip

pytestmark = pytest.mark.spark

N_ROWS = 3000


def test_pages_generator_deterministic(spark):
    a = pages_df(spark, 500, partitions=2).orderBy("url").toPandas()
    b = pages_df(spark, 500, partitions=7).orderBy("url").toPandas()
    assert a.equals(b), "pages table must be parallelism-invariant"
    local = pages_pandas(500).sort_values("url").reset_index(drop=True)
    assert list(a["url"]) == list(local["url"])


@pytest.mark.parametrize("profile", ["auto", "reference"])
def test_pages_roundtrip(spark, tmp_path, profile):
    out = str(tmp_path / f"enc_{profile}")
    df = pages_df(spark, N_ROWS, partitions=4)
    man = encode_table(df, out, key_col="url", partitions=6, profile=profile)
    rows = man.collect()
    assert {r["column"] for r in rows} == {"url", "warc_ts", "html", "text", "lang"}
    assert sum(r["num_rows"] for r in rows if r["column"] == "url") == N_ROWS
    decoded = decode_table(spark, out)
    res = verify_roundtrip(df, decoded, key="url")
    assert res["ok"], res
    assert res["rows"] == N_ROWS


def test_codec_selection_on_pages(spark, tmp_path):
    out = str(tmp_path / "enc_sel")
    df = pages_df(spark, N_ROWS, partitions=2)
    rows = encode_table(df, out, key_col="url", partitions=2, profile="auto").collect()
    enc_of = {}
    for r in rows:
        if r["num_rows"] > 0:  # empty partitions carry the empty-dict chunk
            enc_of.setdefault(r["column"], set()).add(r["encoding"])
    # FIXTURES.md verification contract #3. warc_ts after the url-hash
    # shuffle is clustered-but-unsorted: the FOR family (delta_bp = FOR
    # on deltas, for_bp = FOR on values) must win; which member depends
    # on the partition's sortedness.
    assert enc_of["lang"] <= {"rle_dict"}, enc_of
    assert enc_of["warc_ts"] <= {"delta_bp", "for_bp"}, enc_of
    # compression must actually help on every column vs raw
    total_raw = sum(r["raw_bytes"] for r in rows)
    total_enc = sum(r["encoded_bytes"] for r in rows)
    assert total_enc < total_raw


def test_per_column_encodings_override(spark, tmp_path):
    # the reference's per-column configured encoding (schema.go:519-558):
    # pinned columns bypass the selector, others stay on the profile path
    out = str(tmp_path / "enc_pin")
    df = pages_df(spark, N_ROWS, partitions=2).select("url", "warc_ts", "lang")
    rows = encode_table(
        df, out, key_col="url", partitions=2,
        encodings={"warc_ts": "for_bp", "url": "delta_length"},
    ).collect()
    enc_of = {}
    for r in rows:
        if r["num_rows"] > 0:
            enc_of.setdefault(r["column"], set()).add(r["encoding"])
    assert enc_of["warc_ts"] == {"for_bp"}
    assert enc_of["url"] == {"delta_length"}
    assert enc_of["lang"] <= {"rle_dict"}  # unpinned: selector's choice
    assert verify_roundtrip(df, decode_table(spark, out), key="url")["ok"]
    with pytest.raises(ValueError, match="unknown columns"):
        encode_table(df, str(tmp_path / "x"), encodings={"nope": "plain"})
    with pytest.raises(ValueError, match="codecs"):
        encode_table(df, str(tmp_path / "y"), encodings={"url": "martian"})


def test_resume_skips_committed_partitions(spark, tmp_path):
    out = str(tmp_path / "enc_resume")
    df = pages_df(spark, N_ROWS, partitions=4)
    man1 = encode_table(df, out, key_col="url", partitions=5).collect()
    files1 = {p: os.path.getmtime(p) for p in glob.glob(f"{out}/part-*.bin")}
    assert len(mf.committed_partitions(out)) == 5
    # delete one partition's commit -> only that one re-encodes
    victims = sorted(mf.committed_partitions(out))[:1]
    os.remove(mf.part_manifest_path(out, victims[0]))
    man2 = encode_table(df, out, key_col="url", partitions=5).collect()
    files2 = {p: os.path.getmtime(p) for p in glob.glob(f"{out}/part-*.bin")}
    untouched = [p for p in files1 if f"part-{victims[0]:05d}" not in p]
    for p in untouched:
        assert files1[p] == files2[p], "committed partition was rewritten"
    # manifests agree
    assert sorted((r["partition"], r["column"], r["crc32"]) for r in man1) == sorted(
        (r["partition"], r["column"], r["crc32"]) for r in man2
    )
    decoded = decode_table(spark, out)
    assert verify_roundtrip(df, decoded, key="url")["ok"]


def test_column_projection_decode(spark, tmp_path):
    out = str(tmp_path / "enc_proj")
    df = pages_df(spark, 1000, partitions=2)
    encode_table(df, out, key_col="url", partitions=2).collect()
    dec = decode_table(spark, out, columns=["url", "lang"])
    assert dec.columns == ["url", "lang"]
    got = dec.orderBy("url").toPandas()
    want = df.select("url", "lang").orderBy("url").toPandas()
    assert got.equals(want)


def test_crc_validation_detects_corruption(spark, tmp_path):
    out = str(tmp_path / "enc_crc")
    df = pages_df(spark, 500, partitions=1)
    encode_table(df, out, key_col="url", partitions=1).collect()
    # clean decode validates fine
    assert decode_table(spark, out, validate_crc=True).count() == 500
    # flip one byte mid-file -> validated decode must fail
    fpath = glob.glob(f"{out}/part-*.bin")[0]
    with open(fpath, "r+b") as f:
        f.seek(os.path.getsize(fpath) // 2)
        b = f.read(1)
        f.seek(-1, 1)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(Exception, match="crc mismatch|Py4J|SparkException"):
        decode_table(spark, out, validate_crc=True).count()


def test_stats_pruning_on_decode(spark, tmp_path):
    out = str(tmp_path / "enc_prune")
    df = pages_df(spark, 2000, partitions=2)
    # partition by lang so per-partition lang min/max are narrow
    encode_table(df, out, key_col="lang", partitions=6).collect()
    all_langs = decode_table(spark, out).select("lang").distinct().count()
    target = df.select("lang").first()["lang"]
    pruned = decode_table(spark, out, prune=[("lang", "==", target)])
    # pruning is conservative: result must contain every target row
    want = df.filter(df.lang == target).count()
    got = pruned.filter(pruned.lang == target).count()
    assert got == want
    # and it must actually skip partitions (lang-clustered layout)
    assert pruned.count() < df.count()
    assert all_langs > 1


def test_manifest_readable_as_table(spark, tmp_path):
    out = str(tmp_path / "enc_man")
    df = pages_df(spark, 1000, partitions=2)
    encode_table(df, out, key_col="url", partitions=3).collect()
    man = mf.read_manifest(spark, out)
    agg = man.groupBy("column").count().collect()
    assert all(r["count"] == 3 for r in agg)


def test_snapshot_lineage(spark, tmp_path):
    """Iceberg-snapshot analogue: sequenced append-only job records with
    parent links, byte totals, and the per-encoding mix."""
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    out = str(tmp_path / "enc")
    df = pages_df(spark, 500, partitions=2)
    encode_table(df, out, key_col="url", partitions=2).collect()
    s0 = mf.commit_snapshot(out, "encode", {"partitions": 2})
    assert s0["seq"] == 0 and s0["parent"] is None
    assert s0["partitions"] == 2 and s0["num_rows"] == 500
    assert s0["raw_bytes"] > s0["encoded_bytes"] > 0
    assert sum(s0["encodings"].values()) == 2 * 5  # partitions x columns
    # a second job run (resume: no-op) appends a child snapshot
    encode_table(df, out, key_col="url", partitions=2).collect()
    s1 = mf.commit_snapshot(out, "encode", {"partitions": 2})
    assert s1["seq"] == 1 and s1["parent"] == 0
    snaps = mf.read_snapshots(out)
    assert [s["seq"] for s in snaps] == [0, 1]
    assert snaps[0]["encoded_bytes"] == snaps[1]["encoded_bytes"]


def test_ivf_topk_recall_and_plan(spark):
    """IVF top-k: planted near-duplicates land in the same coarse cell,
    so rank-1 neighbors match the exact scorer; the plan must broadcast
    the probe side (never shuffle or nested-loop the corpus)."""
    import numpy as np

    from parquet_go_spark.ops.similarity import cosine_topk, ivf_topk

    rng = np.random.default_rng(31)
    base = rng.standard_normal((80, 16))
    vecs = np.concatenate([base, base[:8] + 0.005 * rng.standard_normal((8, 16))])
    rows = [(i, v.astype("float32").tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 8")
    res = ivf_topk(df, queries, k=5, n_cells=8, n_probe=3)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    got1 = {r["q_id"]: r["n_id"] for r in res.collect() if r["rank"] == 1}
    want1 = {
        r["q_id"]: r["n_id"] for r in cosine_topk(df, queries, k=5).collect() if r["rank"] == 1
    }
    # a vector and its tiny perturbation quantize to the same argmax cell,
    # so every query's true rank-1 (its planted twin, id+80) is probed
    hits = sum(got1.get(q) == n for q, n in want1.items())
    assert hits == len(want1), (got1, want1)


def test_near_dups_lsh_subset_of_exact(spark):
    """Bucketed near-dup pairs must be a subset of the exact all-pairs
    result (LSH trades recall, never precision: same-bucket pairs get the
    exact scorer)."""
    import numpy as np

    from parquet_go_spark.ops.similarity import embedding_near_dups

    rng = np.random.default_rng(9)
    base = rng.standard_normal((60, 16))
    # plant near-duplicates
    vecs = np.concatenate([base, base[:10] + 0.01 * rng.standard_normal((10, 16))])
    rows = [(i, v.astype("float32").tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r["id_a"], r["id_b"]) for r in embedding_near_dups(df, threshold=0.9, mode="exact").collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]) for r in embedding_near_dups(df, threshold=0.9).collect()
    }
    assert lsh <= exact
    assert len(exact) >= 10  # the planted duplicates are found by exact
    assert len(lsh) >= len(exact) // 2  # and LSH recalls a healthy share


def test_range_layout_prunes_partitions(spark, tmp_path):
    import pyspark.sql.functions as F

    from parquet_go_spark.spark.decode_job import decode_table, surviving_partitions
    from parquet_go_spark.spark.encode_job import encode_table
    from parquet_go_spark.spark.pages_table import pages_df

    df = pages_df(spark, 4000, partitions=2).withColumn(
        "seq", F.abs(F.xxhash64("url")) % 1_000_000
    )
    hash_dir, range_dir = str(tmp_path / "h"), str(tmp_path / "r")
    encode_table(df, hash_dir, key_col="seq", partitions=8).collect()
    encode_table(df, range_dir, key_col="seq", partitions=8, layout="range").collect()
    pred = [("seq", ">=", 100_000), ("seq", "<=", 200_000)]
    surv_hash = surviving_partitions(hash_dir, pred)
    surv_range = surviving_partitions(range_dir, pred)
    # salted hash: every partition spans the full range -> nothing prunes;
    # range layout: disjoint intervals -> only the overlapping few survive
    assert len(surv_hash) == 8
    assert len(surv_range) <= 3
    # identical results either way (pruning is transparent)
    a = decode_table(spark, hash_dir, prune=pred).filter(
        F.col("seq").between(100_000, 200_000)
    )
    b = decode_table(spark, range_dir, prune=pred).filter(
        F.col("seq").between(100_000, 200_000)
    )
    assert sorted(r["url"] for r in a.select("url").collect()) == sorted(
        r["url"] for r in b.select("url").collect()
    )
    assert a.count() > 0


def test_ivf_trained_quantizer_recall(spark):
    """A spherical-k-means-trained quantizer slots into the same plan
    and matches or beats the seeded random quantizer's recall@k against
    the exact scorer on a clustered corpus."""
    import numpy as np

    from parquet_go_spark.ops.similarity import cosine_topk, ivf_topk, train_ivf_kmeans

    rng = np.random.default_rng(17)
    # clustered corpus: 6 gaussian blobs — exactly where a trained
    # quantizer out-buckets a random one
    centers = rng.standard_normal((6, 16)) * 3
    vecs = np.concatenate(
        [c + 0.3 * rng.standard_normal((40, 16)) for c in centers]
    )
    rows = [(i, v.astype("float32").tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id % 40 = 0")

    def recall(res, want):
        got = {(r["q_id"], r["n_id"]) for r in res.collect()}
        return len(got & want) / len(want)

    want = {(r["q_id"], r["n_id"]) for r in cosine_topk(df, queries, k=5).collect()}
    cents = train_ivf_kmeans(df, n_cells=8, seed=7)
    assert cents.shape == (16, 8)
    r_trained = recall(ivf_topk(df, queries, k=5, n_probe=2, centroids=cents), want)
    r_random = recall(ivf_topk(df, queries, k=5, n_cells=8, n_probe=2), want)
    assert r_trained >= r_random
    assert r_trained >= 0.9  # blob members share the trained cell
    # same plan shape: broadcast probe join, never a nested loop
    plan = (
        ivf_topk(df, queries, k=5, n_probe=2, centroids=cents)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_pq_topk_recall_and_plan(spark):
    """PQ (IVF-ADC) top-k: planted near-duplicates quantize to the same
    coarse cell and near-identical codes, so rank-1 neighbors match the
    exact scorer after the re-rank; the plan must broadcast the probe
    and shortlist sides (never shuffle or nested-loop the corpus)."""
    import numpy as np

    from parquet_go_spark.ops.similarity import cosine_topk, pq_topk

    rng = np.random.default_rng(33)
    base = rng.standard_normal((80, 16))
    vecs = np.concatenate([base, base[:8] + 0.003 * rng.standard_normal((8, 16))])
    rows = [(i, v.astype("float32").tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 8")
    res = pq_topk(df, queries, k=5, m=4, n_codes=16, n_cells=8, n_probe=3)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
    got1 = {r["q_id"]: r["n_id"] for r in res.collect() if r["rank"] == 1}
    want1 = {
        r["q_id"]: r["n_id"] for r in cosine_topk(df, queries, k=5).collect() if r["rank"] == 1
    }
    hits = sum(got1.get(q) == n for q, n in want1.items())
    # exact re-rank recovers the planted twin whenever its cell is probed
    assert hits == len(want1), (got1, want1)


def test_pq_trained_codebooks_lift_recall(spark):
    """Per-subspace k-means codebooks (ops/similarity.train_pq_kmeans,
    the FAISS training shape) slot into the same IVF-ADC plan and match
    or beat the seeded random codebook's recall@k on a clustered corpus
    — the gate the round-3 verdict asked for (trained >= seeded)."""
    import numpy as np

    from parquet_go_spark.ops.similarity import (
        cosine_topk,
        pq_topk,
        train_ivf_kmeans,
        train_pq_kmeans,
    )

    import os

    import pytest

    sf_dir = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        pytest.skip("embeddings fixture not present")
    # the real fixture corpus: 64-dim embeddings WITH cluster structure
    # (label column) — the regime where codebook training has something
    # to learn; on iid-gaussian vectors trained ~= seeded by design
    df = spark.read.parquet(path)
    queries = df.filter("vec_id < 8")
    want = {(r["q_id"], r["n_id"]) for r in cosine_topk(df, queries, k=5).collect()}

    def recall(res):
        got = {(r["q_id"], r["n_id"]) for r in res.collect()}
        return len(got & want) / len(want)

    cb = train_pq_kmeans(df, m=8, n_codes=16, seed=17, sample_rows=None)
    assert cb.shape == (8, 8, 16)
    cents = train_ivf_kmeans(df, n_cells=16, seed=13)
    r_seeded = recall(pq_topk(df, queries, k=5))
    r_trained = recall(pq_topk(df, queries, k=5, codebooks=cb, centroids=cents))
    # the trained quantizers follow the corpus density (cells = real
    # clusters, codebook centers at the subvectors' actual ~1/sqrt(m)
    # scale) — the lift must be material, not a tie
    assert r_trained >= r_seeded + 0.05, (r_trained, r_seeded)


def test_ann_broadcast_constants_match_literals(spark):
    """constants="broadcast" ships centroids/codebooks as DATA on a
    one-row broadcast frame instead of nested literals (the production
    path — O(1) expression tree vs O(K*dim) plan-compile). Identical
    doubles + identical rounding => bit-identical ranks in BOTH modes,
    for seeded AND trained constants; the aux join must be a broadcast,
    never a shuffled cartesian."""
    import numpy as np

    from parquet_go_spark.ops.similarity import (
        ivf_topk,
        pq_topk,
        train_ivf_kmeans,
        train_pq_kmeans,
    )

    rng = np.random.default_rng(43)
    vecs = rng.standard_normal((120, 16))
    rows = [(i, v.astype("float32").tolist()) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 6")

    def rowset(res):
        return [tuple(r) for r in res.orderBy("q_id", "rank").collect()]

    assert rowset(ivf_topk(df, queries, k=5, n_cells=8)) == rowset(
        ivf_topk(df, queries, k=5, n_cells=8, constants="broadcast")
    )
    assert rowset(pq_topk(df, queries, k=5, m=4, n_cells=8)) == rowset(
        pq_topk(df, queries, k=5, m=4, n_cells=8, constants="broadcast")
    )
    cb = train_pq_kmeans(df, m=4, n_codes=16, seed=3, sample_rows=None)
    cents = train_ivf_kmeans(df, n_cells=8, seed=3)
    assert rowset(pq_topk(df, queries, k=5, codebooks=cb, centroids=cents)) == rowset(
        pq_topk(df, queries, k=5, codebooks=cb, centroids=cents, constants="broadcast")
    )
    plan = (
        pq_topk(df, queries, k=5, m=4, n_cells=8, constants="broadcast")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the one-row aux frame rides a BroadcastExchange; the corpus side
    # must never be the shuffled side of a cartesian
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_boilerplate_strip_plan_broadcasts_host_totals(spark):
    """strip_boilerplate: the full LINE stream crosses the wire exactly
    ONCE — the doc-id reassembly. The bounded-state countDistinct side
    aggregate costs two LINE-DISTINCT exchanges (dedup on
    (host,line,id), count on (host,line)) — the price of not buffering
    per-line doc-id sets the old collect_set window held — and the
    per-host totals add two doc-level ones. Both the totals join and
    the flagged-keys mark join must be broadcasts (r5: the flagged set
    is gated BEFORE joining back, so no SortMergeJoin re-shuffles the
    exploded stream on (host,line) as the r4 shape did), and NO
    exchange may repartition the exploded stream on host alone (the
    pre-broadcast regression)."""
    import re

    from parquet_go_spark.ops.curate import strip_boilerplate

    rows = [(str(i), f"h{i % 3}", "nav\nbody %d\nfoot" % i) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, host string, text string")
    res = strip_boilerplate(df, "host", "text", "doc_id")
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2, plan
    keys = [
        [c.split("#")[0] for c in m.split(", ")[:-1]]  # drop numPartitions
        for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    ]
    assert len(keys) == 5, plan
    # exactly ONE full-stream line exchange remains: the (host, line)
    # distinct-count aggregate over the deduped (host,line,id) stream
    assert sorted(k for k in keys if "line" in k and "id" not in k) == [
        ["host", "line"],
    ], keys
    # no full-stream host-only repartition: the lone host-keyed exchange
    # is the doc-level totals aggregate
    assert [k for k in keys if k == ["host"]] == [["host"]], keys
    # no SortMergeJoin anywhere: counts shrink to flagged keys before
    # any join back, so both joins broadcast
    assert plan.count("SortMergeJoin") == 0, plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_quantizer_training_tolerates_zero_norm_rows(spark):
    """All-zero embeddings (failed-encoder rows — a real occurrence in
    web-scale embedding tables) must be FILTERED before normalization:
    dividing by nullif(0) yields null ELEMENTS inside a non-null array,
    which na.drop keeps and the MLlib fit then crashes on."""
    import numpy as np

    from parquet_go_spark.ops.similarity import train_ivf_kmeans, train_pq_kmeans

    rng = np.random.default_rng(11)
    vecs = [rng.standard_normal(16) for _ in range(60)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    rows.append((60, [0.0] * 16))  # zero-norm row
    rows.append((61, None))  # null embedding
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = train_ivf_kmeans(df, n_cells=4, seed=3)
    assert cents.shape == (16, 4)
    cb = train_pq_kmeans(df, m=4, n_codes=8, seed=3, sample_rows=None)
    assert cb.shape == (4, 4, 8)


def test_quantizer_save_load_roundtrip_identical_ranks(spark, tmp_path):
    """Persisted quantizers (the FAISS index-file analogue: a JSON
    sidecar under <table>/quantizers/) must reproduce the in-memory
    trained arrays bit-for-bit — same 6-decimal rounding as the query
    builders — so a production query loading from disk returns the
    exact ranks the training session saw."""
    import numpy as np

    from parquet_go_spark.ops.similarity import (
        list_quantizers,
        load_quantizer,
        pq_topk,
        save_quantizer,
        train_ivf_kmeans,
        train_pq_kmeans,
    )

    rng = np.random.default_rng(19)
    vecs = rng.standard_normal((150, 16))
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter("vec_id < 4")
    cents = train_ivf_kmeans(df, n_cells=4, seed=3)
    cb = train_pq_kmeans(df, m=4, n_codes=8, seed=3, sample_rows=None)

    d = str(tmp_path / "tbl")
    save_quantizer(d, "ann", centroids=cents, codebooks=cb, meta={"m": 4})
    assert list_quantizers(d) == ["ann"]
    q = load_quantizer(d, "ann")
    assert np.array_equal(q["centroids"], np.round(cents, 6))
    assert np.array_equal(q["codebooks"], np.round(cb, 6))
    assert q["meta"] == {"m": 4}

    def rowset(res):
        return [tuple(r) for r in res.orderBy("q_id", "rank").collect()]

    mem = rowset(pq_topk(df, queries, k=5, codebooks=cb, centroids=cents))
    disk = rowset(
        pq_topk(
            df,
            queries,
            k=5,
            codebooks=q["codebooks"],
            centroids=q["centroids"],
            constants="broadcast",
        )
    )
    assert mem == disk
