"""Unit tests for the web-crawl ops: HTML text extraction and URL
parsing/normalization edge cases (beyond the oracle's synthetic shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_go_spark.ops.html import extract_text, html_stats
from parquet_go_spark.ops.url import host_stats, normalize_urls, parse_urls

pytestmark = pytest.mark.spark


def _one(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id bigint, html string")
    return extract_text(df, "html", "etext").head()["etext"]


def test_extract_text_cases(spark):
    assert _one(spark, "<p>Hello <b>world</b></p>") == "Hello world"
    assert _one(spark, "a<script>var x='<p>not text</p>';</script>b") == "a b"
    assert _one(spark, "a<style>p { color: red; }</style>b") == "a b"
    assert _one(spark, "a<!-- hidden <b>bold</b> -->b") == "a b"
    assert _one(spark, "x &amp; y &lt;z&gt; &quot;q&quot; &#39;s&#39;") == "x & y <z> \"q\" 's'"
    assert _one(spark, "  lots\n\nof\t whitespace  ") == "lots of whitespace"
    assert _one(spark, "<SCRIPT>upper</SCRIPT>ok") == "ok"
    assert _one(spark, "<br/><img src='x.png'/>text") == "text"
    assert _one(spark, "plain text, no markup") == "plain text, no markup"


def test_html_stats_shape(spark):
    df = spark.createDataFrame(
        [(1, "<html><body><a href='x'>l</a><a href='y'>m</a><p>t</p></body></html>")],
        "doc_id bigint, html string",
    )
    row = html_stats(df).head()
    assert row["n_links"] == 2
    assert row["n_tags"] >= 7
    assert 0 < row["text_ratio"] < 1
    assert row["text_len"] == len("l m t")


def test_parse_urls_components(spark):
    df = spark.createDataFrame(
        [
            (1, "https://Example.COM:8443/a/b?x=1&y=2#frag"),
            (2, "http://host/"),
            (3, "ftp://files.example.org:21/pub"),
            (4, "not a url"),
        ],
        "id bigint, url string",
    )
    rows = {r["id"]: r for r in parse_urls(df, "url").collect()}
    r1 = rows[1]
    assert (r1["scheme"], r1["host"], r1["port"]) == ("https", "example.com", 8443)
    assert (r1["path"], r1["query"], r1["fragment"]) == ("/a/b", "x=1&y=2", "frag")
    assert rows[2]["port"] is None and rows[2]["path"] == "/"
    assert rows[3]["port"] == 21
    # non-URL: all components empty
    assert rows[4]["scheme"] == "" and rows[4]["host"] == ""


def test_normalize_urls(spark):
    cases = [
        ("HTTPS://WWW.EX.COM:443/p?a=1#f", "https://www.ex.com/p?a=1"),
        ("http://Ex.com:80", "http://ex.com/"),
        ("http://ex.com:8080/x", "http://ex.com:8080/x"),
        ("https://ex.com/x?", "https://ex.com/x"),
        ("ftp://F.com:21/d", "ftp://f.com/d"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)], "id bigint, url string")
    got = {r["id"]: r["url_norm"] for r in normalize_urls(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i])


def test_host_stats(spark):
    urls = [
        "https://a.com/x/1",
        "https://a.com/x/2",
        "https://a.com/x/1",
        "https://B.com/",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "id bigint, url string")
    rows = {r["host"]: r for r in host_stats(df).collect()}
    assert rows["a.com"]["n_pages"] == 3
    assert rows["a.com"]["n_paths"] == 2
    assert rows["b.com"]["n_pages"] == 1
    assert rows["a.com"]["avg_depth"] == 2.0


def test_repetition_signals_flags_stuffed_pages(spark):
    from parquet_go_spark.ops.text import repetition_signals

    rows = [
        (1, "buy cheap pills buy cheap pills buy cheap pills buy cheap pills"),
        (2, "a perfectly ordinary sentence with mostly distinct words in it today"),
        (3, "spam spam spam spam spam spam spam spam"),
        (4, None),
        # < 3 words: zero 3-grams by definition. Under ANSI mode an
        # unguarded sequence(1, size-2) produced the DESCENDING [1, 0]
        # and crashed with INVALID_ARRAY_INDEX on these rows.
        (5, ""),
        (6, "one"),
        (7, "two words"),
        (8, "  "),  # whitespace-only -> zero non-empty words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert set(out) == {1, 2, 3, 5, 6, 7, 8}  # nulls dropped
    for short_id, nw in ((5, 0), (6, 1), (7, 2), (8, 0)):
        r = out[short_id]
        assert r["n_words"] == nw
        assert r["dup_3gram_frac"] == 0.0
    # zero-word docs can't trip either gate; 1-2 word docs trip only the
    # top_word_cov gate (cov 1.0 / 0.5), same as the DuckDB oracle
    assert not out[5]["repetitive"] and not out[8]["repetitive"]
    assert out[6]["repetitive"] and out[7]["repetitive"]
    assert out[6]["top_word_cov"] == 1.0  # single word covers everything
    assert out[6]["mean_word_len"] == 3.0
    assert out[5]["top_word_cov"] == 0.0 and out[5]["mean_word_len"] == 0.0
    assert out[1]["repetitive"] and out[3]["repetitive"] and not out[2]["repetitive"]
    assert out[3]["top_word_cov"] == 1.0
    assert out[2]["dup_3gram_frac"] == 0.0
    assert abs(out[1]["dup_3gram_frac"] - 0.7) < 1e-9  # 10 grams, 3 distinct
