"""Corpus curation pipeline: dedup + quality gates in one exchange,
row-preserving variant, and the end-to-end CLI (decode -> curate ->
encode with a lineage snapshot)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.ops.curate import curate_corpus, curate_corpus_rows

pytestmark = pytest.mark.spark

GOOD_A = "the quick brown fox jumps over the lazy dog today."
GOOD_B = "a different sentence with plenty of distinct words, nicely varied."
LOW_TTR = "spam spam spam spam spam spam spam spam spam spam"


def _df(spark):
    rows = [
        (1, GOOD_A, "en"),
        (2, GOOD_A, "en"),     # exact dup of 1
        (3, GOOD_B, "en"),
        (4, None, "en"),       # null text: dropped
        (5, LOW_TTR, "en"),    # fails ttr gate
        (6, GOOD_A, "en"),     # another dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_curate_corpus_keeps_representatives_and_gates(spark):
    out = curate_corpus(_df(spark)).orderBy("doc_id").collect()
    assert [(r.doc_id, r.n_dups) for r in out] == [(1, 3), (3, 1)]
    assert all(r.ttr >= 0.3 for r in out)


def test_curate_corpus_rows_preserves_full_rows(spark):
    out = curate_corpus_rows(_df(spark)).orderBy("doc_id").collect()
    assert [(r.doc_id, r.text, r.lang, r.n_dups) for r in out] == [
        (1, GOOD_A, "en", 3),
        (3, GOOD_B, "en", 1),
    ]


def test_curate_variants_agree(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {(r.doc_id, r.n_dups) for r in curate_corpus(df).collect()}
    b = {(r.doc_id, r.n_dups) for r in curate_corpus_rows(df).collect()}
    assert a == b and a


def test_curate_cli_end_to_end(spark, tmp_path, capsys):
    from parquet_go_spark import cli
    from parquet_go_spark.spark import manifest as mf
    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table

    src = str(tmp_path / "src")
    out = str(tmp_path / "cur")
    encode_table(_df(spark), src, partitions=2).collect()
    rc = cli.main(
        ["curate", "--enc", src, "--out", out, "--key-col", "doc_id", "--partitions", "2"]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["rows_out"] == 2
    back = decode_table(spark, out).orderBy("doc_id").collect()
    assert [(r.doc_id, r.n_dups) for r in back] == [(1, 3), (3, 1)]
    snap = mf.read_snapshots(out)[-1]
    assert snap["operation"] == "curate"
    assert snap["config"]["source"] == src


def test_strip_boilerplate_removes_frequent_keeps_rare(spark):
    from parquet_go_spark.ops.curate import strip_boilerplate

    rows = []
    for h in ("a.com", "b.org"):
        for i in range(10):
            lines = [f"welcome to {h}"]          # 100% of host docs -> removed
            lines.append(f"unique body {h} {i}")  # 10% -> kept
            if i < 2:
                lines.append("rare promo")        # 20% < 30% -> kept
            lines.append(f"(c) {h}")              # 100% -> removed
            rows.append((h + str(i), h, "\n".join(lines)))
    df = spark.createDataFrame(rows, "doc_id string, host string, text string")
    out = {r["doc_id"]: r for r in strip_boilerplate(df, "host", "text", "doc_id").collect()}
    assert len(out) == 20
    r = out["a.com0"]
    assert r["n_lines_removed"] == 2
    assert r["clean_text"] == "unique body a.com 0\nrare promo"
    r = out["b.org5"]
    assert r["clean_text"] == "unique body b.org 5"
    # order preserved when multiple survivors
    assert all("welcome" not in r["clean_text"] and "(c)" not in r["clean_text"] for r in out.values())


def test_strip_boilerplate_skewed_host_bounded_state(spark):
    """One mega-host carrying a universal line (the round-3 memory
    hazard): the hottest (host, line) group must be aggregated by a
    bounded countDistinct, never buffered as a collect_set window
    frame. Pins both the results under planted skew and the plan shape
    (no Window/collect_set operator anywhere in the plan)."""
    from parquet_go_spark.ops.curate import strip_boilerplate

    rows = []
    # mega-host: 400 docs, every one carries the same empty line + footer
    for i in range(400):
        rows.append((f"m{i}", "mega.com", f"body {i}\n\nshared footer\nbody2 {i}"))
    # tiny host: 3 docs, footer appears once (33% > 30% with min_docs=2? no: 1 doc < min_docs)
    for i in range(3):
        rows.append((f"t{i}", "tiny.org", f"t-body {i}" + ("\nshared footer" if i == 0 else "")))
    df = spark.createDataFrame(rows, "doc_id string, host string, text string")
    q = strip_boilerplate(df, "host", "text", "doc_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "collect_set" not in plan and "Window" not in plan
    out = {r["doc_id"]: r for r in q.collect()}
    assert len(out) == 403
    # mega-host: empty line + footer stripped (each in 100% of 400 docs)
    assert out["m7"]["clean_text"] == "body 7\nbody2 7"
    assert out["m7"]["n_lines_removed"] == 2
    # tiny host: footer in 1/3 docs -> below min_docs=2, kept
    assert out["t0"]["clean_text"] == "t-body 0\nshared footer"
    assert out["t0"]["n_lines_removed"] == 0


def test_strip_boilerplate_all_lines_removed_yields_empty(spark):
    from parquet_go_spark.ops.curate import strip_boilerplate

    rows = [(str(i), "h", "same line\nsame too") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id string, host string, text string")
    out = strip_boilerplate(df, "host", "text", "doc_id").collect()
    assert all(r["clean_text"] == "" and r["n_lines_removed"] == 2 for r in out)


def test_cli_curate_strip_boilerplate(spark, tmp_path):
    import json as _json
    import subprocess
    import sys

    import pyspark.sql.functions as F

    from parquet_go_spark.spark.decode_job import decode_table
    from parquet_go_spark.spark.encode_job import encode_table

    rows = []
    for h in ("a.com", "b.org"):
        for i in range(12):
            rows.append(
                (
                    h + f"-{i}",
                    h,
                    f"welcome to {h}\nbody text {h} {i} unique words here plenty\n(c) {h}",
                )
            )
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    src = str(tmp_path / "src")
    encode_table(df, src, partitions=2).collect()
    out = str(tmp_path / "out")
    r = subprocess.run(
        [
            sys.executable, "-m", "parquet_go_spark", "--cpus", "4",
            "curate", "--enc", src, "--out", out,
            "--id-col", "doc_id", "--min-ttr", "0.0", "--max-punct", "1.0",
            "--strip-boilerplate", "--host-col", "source",
        ],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = _json.loads(r.stdout.strip().splitlines()[-1])
    assert info["rows_out"] == 24
    got = decode_table(spark, out)
    texts = [x["text"] for x in got.select("text").collect()]
    assert all("welcome" not in t and "(c)" not in t for t in texts)
    assert all(t.startswith("body text") for t in texts)
