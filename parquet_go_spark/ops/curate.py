"""Corpus curation: the composed training-data pipeline over web text —
null-drop -> per-row quality scoring -> exact dedup (one representative
per duplicate group) -> quality gate. One declarative plan, ONE shuffle.

This is the shape a 100 TB curation job takes: the per-row scoring is
whole-stage codegen (zero Python), the only exchange groups by a 16-byte
md5 fingerprint (never the document text), and the representative's
fields ride through the aggregation via ``min_by`` structs so no second
join/shuffle is needed to recover them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["curate_corpus", "curate_corpus_rows", "strip_boilerplate"]


def strip_boilerplate(
    df: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_ratio: float = 0.3,
    min_docs: int = 2,
    broadcast_flagged: bool = True,
) -> DataFrame:
    """CCNet-style per-host frequent-line removal: a line that appears
    in more than ``max_ratio`` of a host's documents (and at least
    ``min_docs`` of them) is boilerplate — navigation, copyright
    footers, cookie banners — and is stripped; everything else keeps
    its original order. Returns ``(id, host, clean_text,
    n_lines_removed)`` with ``clean_text`` the surviving lines joined
    by ``\\n`` (empty string when every line was boilerplate).

    Plan (the 100 TB shape): explode to lines (no shuffle) -> a
    ``groupBy(host, line).agg(countDistinct(id))`` side aggregate
    [Spark plans count-distinct as dedup-on-(host,line,id) then count,
    so per-group state is one counter — NOT the full doc-id set a
    ``collect_set`` window would buffer; a universal line on a
    mega-host (empty line, shared footer) stays O(1) memory per
    group] -> REDUCE the counts to only the flagged boilerplate keys
    (counts join the tiny broadcast per-host totals and the
    ``min_docs``/``max_ratio`` gates apply BEFORE any join back, so
    the join-back side is the boilerplate set itself, not every
    distinct line) -> mark the exploded stream by a broadcast left
    join on ``(host, line)`` -> ONE full-stream exchange on the doc id
    to reassemble surviving lines in order. The full line stream
    crosses the wire exactly once; the r4 shape sort-merge-joined it a
    second time against ALL distinct-line counts. Counts are integers
    and reassembly sorts by line index, so the result is deterministic
    in any engine (the DuckDB oracle matches exactly).

    ``broadcast_flagged=True`` (default) ships the flagged set as an
    explicit broadcast — right for any realistic boilerplate density
    (the set is bounded by lines that repeat across >=``max_ratio`` of
    a host's docs). On a corpus whose flagged set could outgrow the
    driver (extreme host cardinality x per-host boilerplate), pass
    False: the join falls back to a shuffle that AQE still converts to
    a broadcast at runtime when the set turns out small.
    """
    if host_col == id_col:
        # per-host frequency over a per-document key is a no-op (every
        # host holds one doc) AND the output would carry two identical
        # column names — fail with the semantic error, not Spark's
        # opaque COLUMN_ALREADY_EXISTS at the final union
        raise ValueError(
            "strip_boilerplate: host_col and id_col must differ — boilerplate "
            "is a PER-HOST frequency signal; derive a host column (e.g. "
            "regexp_extract(url, '^[a-z]+://([^/]+)', 1)) first"
        )
    # docs with NULL host or NULL text cannot participate in per-host
    # frequency analysis (NULL never equi-joins; posexplode of NULL
    # emits zero rows) — previously they VANISHED from the output; they
    # pass through unstripped instead, preserving the every-doc contract
    analyzable = df.where(F.col(host_col).isNotNull() & F.col(text_col).isNotNull())
    passthrough = df.where(F.col(host_col).isNull() | F.col(text_col).isNull()).select(
        F.col(id_col),
        F.col(host_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("clean_text"),
        F.lit(0).cast("long").alias("n_lines_removed"),
    )
    lines = analyzable.select(
        F.col(id_col).alias("id"),
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    host_docs = analyzable.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    # Per-(host, line) distinct-doc counts as a separate aggregate
    # joined back, NOT a collect_set window: the window form buffered
    # every doc id of a line for every occurrence row, and the hottest
    # lines — the very boilerplate being targeted — built the largest
    # frames (executor-memory hazard at 100x scale). countDistinct
    # plans as a bounded two-stage dedup+count.
    line_docs = lines.groupBy("host", "line").agg(F.countDistinct("id").alias("line_docs"))
    # explicit broadcast: the totals side is one tiny row per host
    # (doc-level aggregate); the gates then shrink the counts to the
    # boilerplate keys alone BEFORE anything joins the line stream
    bp_keys = (
        line_docs.join(F.broadcast(host_docs), "host")
        .where(
            (F.col("line_docs") >= min_docs)
            & (F.col("line_docs").cast("double") > F.col("n_docs").cast("double") * max_ratio)
        )
        .select("host", "line", F.lit(True).alias("is_bp"))
    )
    if broadcast_flagged:
        bp_keys = F.broadcast(bp_keys)
    flagged = lines.join(bp_keys, ["host", "line"], "left").withColumn(
        "is_bp", F.coalesce(F.col("is_bp"), F.lit(False))
    )
    return (
        flagged.groupBy("id", "host")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(~F.col("is_bp"), F.struct("idx", "line")).otherwise(None)
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.sum(F.col("is_bp").cast("long")).alias("n_lines_removed"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("host").alias(host_col),
            "clean_text",
            "n_lines_removed",
        )
        .unionByName(passthrough)
    )


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    min_ttr: float = 0.3,
    max_punct: float = 0.1,
) -> DataFrame:
    """Returns the curated corpus: one row per kept document with
    ``(id, lang, n_tokens, ttr, n_dups)``.

    Kept = non-null text, the minimum-id representative of its exact
    duplicate group, type-token ratio >= ``min_ttr`` and punctuation
    ratio <= ``max_punct`` (boilerplate/markup-soup gates). ``n_dups``
    is the group's size — the dedup "weight" training pipelines keep for
    loss re-weighting.

    Plan: projection (codegen) -> one groupBy on the md5 fingerprint
    with map-side partial ``min_by`` -> filter. The quality gate runs
    AFTER dedup on the representative only, matching the usual pipeline
    order (dedup first, filters on survivors).
    """
    t = F.col(text_col)
    words = F.split(t, " ")
    n_tokens = F.size(words)
    ttr = F.size(F.array_distinct(words)).cast("double") / n_tokens.cast("double")
    punct = (
        F.size(F.expr(f"regexp_extract_all(`{text_col}`, '[.,;:!?]', 0)")).cast("double")
        / F.greatest(F.length(t), F.lit(1)).cast("double")
    )
    scored = df.filter(t.isNotNull()).select(
        F.md5(t).alias("__fp"),
        F.struct(
            F.col(id_col),
            F.col(lang_col),
            n_tokens.cast("long").alias("n_tokens"),
            ttr.alias("ttr"),
            punct.alias("__punct"),
        ).alias("__s"),
    )
    kept = scored.groupBy("__fp").agg(
        F.min_by("__s", F.col("__s").getField(id_col)).alias("__s"),
        F.count(F.lit(1)).alias("n_dups"),
    )
    return (
        kept.filter((F.col("__s.ttr") >= min_ttr) & (F.col("__s.__punct") <= max_punct))
        .select(
            F.col("__s").getField(id_col).alias(id_col),
            F.col("__s").getField(lang_col).alias(lang_col),
            F.col("__s.n_tokens").alias("n_tokens"),
            F.col("__s.ttr").alias("ttr"),
            "n_dups",
        )
    )


def curate_corpus_rows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_ttr: float = 0.3,
    max_punct: float = 0.1,
) -> DataFrame:
    """:func:`curate_corpus` keeping FULL ROWS: the curated corpus with
    every input column (the representative row of each duplicate group)
    plus ``n_dups``. Same one-exchange plan — the whole row rides the
    ``min_by`` struct, so the text crosses the wire exactly once (any
    dedup that outputs text must move it once; this avoids the second
    join-back shuffle).
    """
    t = F.col(text_col)
    words = F.split(t, " ")
    n_tokens = F.size(words)
    ttr = F.size(F.array_distinct(words)).cast("double") / n_tokens.cast("double")
    punct = (
        F.size(F.expr(f"regexp_extract_all(`{text_col}`, '[.,;:!?]', 0)")).cast("double")
        / F.greatest(F.length(t), F.lit(1)).cast("double")
    )
    scored = df.filter(t.isNotNull()).select(
        F.md5(t).alias("__fp"),
        F.struct(*[F.col(c) for c in df.columns]).alias("__row"),
        F.struct(ttr.alias("ttr"), punct.alias("punct"), F.col(id_col).alias("id")).alias("__q"),
    )
    kept = scored.groupBy("__fp").agg(
        F.min_by("__row", F.col("__q.id")).alias("__row"),
        F.min_by("__q", F.col("__q.id")).alias("__q"),
        F.count(F.lit(1)).alias("n_dups"),
    )
    return (
        kept.filter((F.col("__q.ttr") >= min_ttr) & (F.col("__q.punct") <= max_punct))
        .select(*[F.col("__row").getField(c).alias(c) for c in df.columns], "n_dups")
    )
