"""URL parsing, normalization, and host statistics for web-crawl tables.

A 10^12-page crawl keys everything on url (the engine's salted
partition key, bloom key, and dedup identity), so canonicalizing URLs
before hashing is what makes those keys stable: scheme/host case,
default ports, and fragments must not split one page across partitions.

All parsing is one portable regexp (Java ∩ RE2: no lookaround) evaluated
as JVM codegen expressions; the DuckDB oracle runs the identical
pattern.  Spark's built-in ``parse_url`` is deliberately not used — it
is a Java UDF-ish expression with no DuckDB analogue, so it would leave
the operator outside the hash-parity gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["parse_urls", "normalize_url_col", "normalize_urls", "host_stats"]

# groups: 1 scheme, 2 host, 3 :port, 4 path, 5 ?query, 6 #fragment
URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/:?#]*)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$"

_DEFAULT_PORTS = {"http": ":80", "https": ":443", "ftp": ":21"}


def _grp(url: Column, i: int) -> Column:
    return F.regexp_extract(url, URL_RE, i)


def parse_urls(df: DataFrame, url_col: str = "url", keep: bool = True) -> DataFrame:
    """Split a url column into scheme/host/port/path/query/fragment
    (empty string where a component is absent, port as int or null)."""
    u = F.col(url_col)
    port = F.regexp_replace(_grp(u, 3), ":", "")
    cols = [
        F.lower(_grp(u, 1)).alias("scheme"),
        F.lower(_grp(u, 2)).alias("host"),
        F.when(port != "", port.cast("int")).alias("port"),
        _grp(u, 4).alias("path"),
        F.regexp_replace(_grp(u, 5), r"^\?", "").alias("query"),
        F.regexp_replace(_grp(u, 6), "^#", "").alias("fragment"),
    ]
    return df.select(*(df.columns if keep else [url_col]), *cols)


def normalize_url_col(url: Column) -> Column:
    """Canonical form: scheme+host lowercased, default port dropped,
    fragment dropped, empty path → '/', trailing '?' dropped."""
    scheme = F.lower(_grp(url, 1))
    host = F.lower(_grp(url, 2))
    port = _grp(url, 3)
    path = _grp(url, 4)
    query = _grp(url, 5)
    port_kept = port
    for sch, dflt in _DEFAULT_PORTS.items():
        port_kept = F.when((scheme == sch) & (port == dflt), "").otherwise(port_kept)
    path_n = F.when(path == "", "/").otherwise(path)
    query_n = F.when(query == F.lit("?"), "").otherwise(query)
    return F.concat(scheme, F.lit("://"), host, port_kept, path_n, query_n)


def normalize_urls(df: DataFrame, url_col: str = "url", out_col: str = "url_norm") -> DataFrame:
    return df.withColumn(out_col, normalize_url_col(F.col(url_col)))


def host_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Pages / distinct paths / mean path depth per host — the domain-skew
    profile that decides salting (a handful of hosts holding most pages is
    exactly the skew ``encode_table``'s salted layout defuses)."""
    u = F.col(url_col)
    host = F.lower(_grp(u, 2))
    path = _grp(u, 4)
    depth = F.size(F.split(path, "/")) - 1
    return (
        df.select(host.alias("host"), path.alias("path"), depth.alias("depth"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("path").alias("n_paths"),
            F.round(F.avg("depth"), 6).alias("avg_depth"),
        )
    )
