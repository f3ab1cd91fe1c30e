"""HTML → text extraction and page-structure stats for web-crawl tables.

The north-star input is Common-Crawl-style pages (url, warc_ts, html,
text, lang); the per-row invariant the whole engine is gated on is
byte-identical extracted text per url. These operators provide the
extraction step itself as pure JVM-side column expressions — one
``regexp_replace`` chain, whole-stage-codegen, no Python in the hot
path — so the text column of a 10^12-page table can be (re)derived from
html in the same scan that encodes it.

Every regex is restricted to the Java ∩ RE2 portable subset (no
lookaround, no backreferences) so the DuckDB oracle can run the
IDENTICAL chain; correctness is hash-parity, not eyeballing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["extract_text_col", "extract_text", "html_stats"]

# order matters: kill script/style bodies before generic tag stripping
_BLOCK_RE = r"(?is)<(script|style)[^>]*>.*?</(script|style)>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_TAG_RE = r"(?s)</?[a-zA-Z!][^>]*>"
_WS_RE = r"\s+"

_ENTITIES = [
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
]


def extract_text_col(html: Column) -> Column:
    """html string -> visible text (tags/scripts/comments stripped,
    common entities decoded, whitespace collapsed)."""
    c = F.regexp_replace(html, _BLOCK_RE, " ")
    c = F.regexp_replace(c, _COMMENT_RE, " ")
    c = F.regexp_replace(c, _TAG_RE, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, _WS_RE, " "))


def extract_text_sql(expr: str) -> str:
    """The byte-identical DuckDB chain over SQL expression ``expr`` —
    kept next to the Spark form so they cannot drift apart."""
    c = f"regexp_replace({expr}, '{_BLOCK_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_COMMENT_RE}', ' ', 'g')"
    c = f"regexp_replace({c}, '{_TAG_RE}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        r = rep.replace("'", "''")
        c = f"replace({c}, '{ent}', '{r}')"
    return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"


def extract_text(df: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    return df.withColumn(out_col, extract_text_col(F.col(html_col)))


def html_stats(df: DataFrame, html_col: str = "html", id_col: str = "doc_id") -> DataFrame:
    """Page-structure quality signals: sizes, tag/link counts, link
    density and text-to-markup ratio (boilerplate detectors' core
    features) — all codegen expressions over one pass."""
    h = F.col(html_col)
    text = extract_text_col(h)
    n_tags = F.size(F.split(h, r"<[a-zA-Z!/]")) - 1
    n_links = F.size(F.split(F.lower(h), r"<a[\s>]")) - 1
    return df.select(
        F.col(id_col),
        F.length(h).alias("html_len"),
        F.length(text).alias("text_len"),
        n_tags.cast("int").alias("n_tags"),
        n_links.cast("int").alias("n_links"),
        F.round(n_links / F.greatest(n_tags, F.lit(1)), 6).alias("link_density"),
        F.round(F.length(text) / F.greatest(F.length(h), F.lit(1)), 6).alias("text_ratio"),
    )
