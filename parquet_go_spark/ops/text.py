"""Text-analysis operators: token stats, quality scoring, document
fingerprinting, language ID. Everything except language-ID is pure
built-in-function Spark SQL (JVM-side, codegen, SQL-oracle-checkable);
language-ID is a two-pass n-gram profile classifier with a broadcast
profile table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["token_stats", "text_quality", "fingerprint", "langid_ngram", "repetition_signals"]


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts via length arithmetic (identical
    semantics in any ANSI SQL engine: no regex/split divergence)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = n_chars - F.length(F.replace(t, F.lit(" "), F.lit(""))) + F.lit(1)
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        ((n_chars - n_tokens + 1).cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        # BPE-ish regex word tokens (alnum runs), engine-portable pattern;
        # the class covers BOTH cases — '[a-z0-9]+' on raw text treated
        # uppercase letters as separators ('HELLO' counted 0 tokens)
        F.size(F.expr(f"regexp_extract_all(`{text_col}`, '[a-zA-Z0-9]+', 0)"))
        .cast("long")
        .alias("n_word_tokens"),
    )


# small engine-portable stopword core (quality signal, not linguistics)
STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def text_quality(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Quality heuristics over web text: type-token ratio, punctuation
    ratio, stopword ratio; the low-quality flag mimics boilerplate/spam
    filters in web-text pipelines (near-zero vocabulary diversity, or
    punctuation-heavy markup soup, or a stopword-free keyword-stuffed
    page). Pure built-in SQL — whole-stage codegen, zero Python."""
    words = F.split(F.col(text_col), " ")
    n_tokens = F.size(words)
    n_types = F.size(F.array_distinct(words))
    ttr = n_types.cast("double") / n_tokens.cast("double")
    n_chars = F.length(F.col(text_col))
    punct_ratio = (
        F.size(F.expr(f"regexp_extract_all(`{text_col}`, '[.,;:!?]', 0)")).cast("double")
        / F.greatest(n_chars, F.lit(1)).cast("double")
    )
    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop_ratio = (
        F.expr(f"size(filter(split(`{text_col}`, ' '), w -> w in ({stops})))").cast("double")
        / n_tokens.cast("double")
    )
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        n_types.cast("long").alias("n_types"),
        ttr.alias("ttr"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        ((ttr < 0.3) | (punct_ratio > 0.1) | (stop_ratio == 0.0)).alias("low_quality"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 of the text bytes plus a
    64-bit prefix as a numeric key (hex -> bigint), engine-portable."""
    fp = F.md5(F.col(text_col))
    return df.select(
        F.col(id_col),
        fp.alias("fp"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fp60"),
    )


def langid_ngram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    top_ngrams: int = 40,
    profile_docs: int = 2000,
) -> DataFrame:
    """Language ID by character-bigram profiles (Cavnar-Trenkle style).

    Pass 1 builds per-language top-N bigram profiles from the labeled
    corpus (aggregation, tiny result); pass 2 classifies every document
    by profile overlap with the broadcast profiles. At scale pass 1 runs
    on a sample; the join is a broadcast (profiles are KBs).
    Returns (id, lang, lang_pred, correct) — ONE ROW PER INPUT DOCUMENT:
    a doc with no profile-matching bigrams (empty/null text, or a script
    outside the sampled profiles) comes back with lang_pred NULL and
    correct NULL, never silently dropped (an inner join here inflated
    downstream accuracy and lost rows for consumers joining predictions
    back to the corpus).
    """
    # materialize lower(text) and the bigram array once. Bigrams come from
    # a char split + shifted zip_with, NOT substring(i, 2) in a transform:
    # UTF8String.substring walks from the string start, so that form is
    # O(len²) per document — the split/zip form is O(len)
    base = (
        df.select(F.col(id_col), F.col(lang_col), F.lower(F.col(text_col)).alias("__lt"))
        .select(F.col(id_col), F.col(lang_col), F.expr("split(__lt, '')").alias("__ch"))
        .select(
            F.col(id_col),
            F.col(lang_col),
            F.expr(
                "zip_with(slice(__ch, 1, size(__ch) - 1),"
                " slice(__ch, 2, size(__ch) - 1), (a, b) -> concat(a, b))"
            ).alias("__bg"),
        )
    )
    # profile pass runs on a bounded, DETERMINISTIC sample (id < N —
    # limit() is partition-order-dependent); at 10^12 docs the profiles
    # converge long before the corpus is exhausted
    exploded = base.filter(F.col(id_col) < profile_docs).select(
        F.col(lang_col), F.explode("__bg").alias("bg")
    )
    counts = exploded.groupBy(lang_col, "bg").count()
    from pyspark.sql.window import Window

    w = Window.partitionBy(lang_col).orderBy(F.desc("count"), F.asc("bg"))
    profiles = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_ngrams)
        .select(F.col(lang_col).alias("profile_lang"), "bg", "rank")
    )
    # classify: per doc, score = sum over doc bigrams present in each
    # profile. One broadcast hash join (O(1) lookups — profiles are KBs)
    # and ONE groupBy with conditional per-language aggregation; the best
    # language falls out of a sort_array projection over the pivoted
    # scores. No second aggregation and no window sort — the shuffle
    # carries one row per (doc, matched bigram) with map-side partial
    # aggregation collapsing it to one row per doc.
    # profile languages == distinct langs of the bounded sample (cheap
    # build-time job over <= profile_docs rows; running the full profile
    # aggregation here would execute it twice)
    langs = sorted(
        r[0]
        for r in df.filter(F.col(id_col) < profile_docs).select(lang_col).distinct().collect()
        if r[0] is not None
    )
    if not langs:
        # no labeled sample rows -> no profiles: every document is
        # unclassifiable, and the one-row-per-doc contract still holds
        return base.select(
            F.col(id_col),
            F.col(lang_col),
            F.lit(None).cast("string").alias("lang_pred"),
            F.lit(None).cast("boolean").alias("correct"),
        )
    # explode_outer keeps a (bg = NULL) row for empty/null bigram arrays
    # and the LEFT broadcast join keeps bigrams outside every profile —
    # both score 0 everywhere, so every document survives to the groupBy
    doc_bigrams = base.select(
        F.col(id_col),
        F.col(lang_col),
        F.explode_outer(F.array_distinct(F.col("__bg"))).alias("bg"),
    )
    w = F.lit(top_ngrams + 1) - F.col("rank")
    scored = (
        doc_bigrams.join(F.broadcast(profiles), "bg", "left")
        .groupBy(id_col, lang_col)
        .agg(
            *[
                F.sum(F.when(F.col("profile_lang") == l, w).otherwise(F.lit(0))).alias(f"s_{i}")
                for i, l in enumerate(langs)
            ]
        )
    )
    # sort_array ascending on struct(-score, lang): element 0 is the max
    # score with ties broken by smallest lang — identical to the previous
    # row_number(desc score, asc lang) pick
    best = F.sort_array(
        F.array(
            *[
                F.struct((-F.col(f"s_{i}")).alias("ns"), F.lit(l).alias("lang"))
                for i, l in enumerate(langs)
            ]
        )
    )[0]
    return scored.select(
        F.col(id_col),
        F.col(lang_col),
        best.alias("best"),
    ).select(
        F.col(id_col),
        F.col(lang_col),
        # a zero max score means NO bigram matched any profile — an
        # all-zero tie-break would otherwise "predict" the alphabetically
        # smallest language for empty/foreign-script docs
        F.when(F.col("best.ns") < 0, F.col("best.lang")).alias("lang_pred"),
        F.when(F.col("best.ns") < 0, F.col("best.lang") == F.col(lang_col)).alias("correct"),
    )


def repetition_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1, the standard web-text repetition gates): fraction of
    duplicate word 3-grams, coverage of the single most frequent word,
    mean word length, and the composite ``repetitive`` flag. Pure
    built-in SQL — 3-grams via a transform over index sequences, counts
    via array algebra, all whole-stage codegen, zero Python and zero
    shuffles (one projection).

    A keyword-stuffed or template-generated page shows near-total
    3-gram duplication and one word covering a large share of tokens;
    clean prose sits near zero on both."""
    t = F.col(text_col)
    # Stage the filtered word array ONCE: inlining filter(split(text))
    # inside the gram transform re-evaluated it 3x PER GRAM INDEX (Spark
    # does not hoist loop-invariant subexpressions out of higher-order-
    # function lambdas), turning a linear projection quadratic on long
    # documents. CollapseProject keeps a multiply-referenced non-cheap
    # alias staged, so __w materializes once per row.
    base = df.filter(t.isNotNull()).select(
        F.col(id_col), F.expr(f"filter(split(`{text_col}`, ' '), w -> w <> '')").alias("__w")
    )
    words = F.col("__w")
    n_words = F.size(words)
    # Guarded gram construction: sequence(1, 0) in Spark yields the
    # DESCENDING [1, 0] (not empty), so an unguarded transform indexes
    # words[-1]/words[size] on docs with < 3 words — an
    # INVALID_ARRAY_INDEX crash under ANSI mode and a silent
    # dup_3gram_frac=0.5 divergence from the oracle without it. Docs
    # shorter than 3 words have zero 3-grams by definition.
    grams = F.when(
        n_words >= 3,
        F.expr(
            "transform(sequence(1, size(__w) - 2),"
            " i -> concat_ws(' ', __w[i - 1], __w[i], __w[i + 1]))"
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    n_grams = F.size(grams)
    dup_gram_frac = F.when(
        n_grams > 0,
        (n_grams - F.size(F.array_distinct(grams))).cast("double") / n_grams.cast("double"),
    ).otherwise(F.lit(0.0))
    # coverage of the most frequent word: max group size / n_words via
    # aggregate over the sorted word array (runs of equal words)
    top_word_cov = F.when(
        n_words > 0,
        F.expr(
            """
            aggregate(
              array_sort(__w),
              named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
              (acc, w) -> named_struct(
                'prev', w,
                'run', IF(acc.prev IS NOT NULL AND w = acc.prev, acc.run + 1L, 1L),
                'best', greatest(acc.best,
                                 IF(acc.prev IS NOT NULL AND w = acc.prev, acc.run + 1L, 1L))),
              acc -> acc.best)
            """
        ).cast("double")
        / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    mean_word_len = F.when(
        n_words > 0,
        F.expr("aggregate(__w, 0L, (acc, w) -> acc + length(w))").cast("double")
        / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    return base.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(dup_gram_frac, 6).alias("dup_3gram_frac"),
        F.round(top_word_cov, 6).alias("top_word_cov"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        ((dup_gram_frac > 0.2) | (top_word_cov > 0.3)).alias("repetitive"),
    )
