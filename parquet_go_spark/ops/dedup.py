"""Deduplication operators: exact (hash group-by), MinHash banding + LSH
candidate pairs, SimHash, and n-gram Jaccard verification.

Scale notes: exact dedup is one shuffle with map-side partial
aggregation; MinHash signatures are a pure per-row projection (no
shuffle); LSH pair generation shuffles on band values (the standard LSH
join) and only candidate pairs — a tiny fraction of n² — reach the
Jaccard verifier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash64",
    "simhash_near_dups",
    "hash_split",
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups byte-identical texts; keeps the smallest id per group.

    The group key is a 128-bit md5 fingerprint of the text, not the text
    itself: at corpus scale, grouping on raw text moves every document's
    full bytes through the shuffle as the key — with the fingerprint the
    shuffle carries 16 bytes + id per row and map-side partial
    aggregation collapses local duplicates before the exchange.
    (Collision probability over 128 bits is negligible below ~2^64
    documents; a verify pass comparing texts within fingerprint groups
    can be layered on for forensic settings.)

    NULL text never forms a group: md5(NULL) is NULL and groupBy keeps
    NULL as a key, so a corpus with many failed-fetch documents would
    collapse them all into ONE 'duplicate group' and a downstream
    canonical-keep would drop every one but the min id. Null-text docs
    pass through as singletons (fp NULL, n_dups 1) instead."""
    grouped = (
        df.where(F.col(text_col).isNotNull())
        .groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )
    nulls = df.where(F.col(text_col).isNull()).select(
        F.lit(None).cast("string").alias("fp"),
        F.col(id_col).alias("keep_id"),
        F.lit(1).cast("long").alias("n_dups"),
    )
    return grouped.unionByName(nulls)


def _shingles_df(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, __sh): word k-shingle array, with words and shingles
    materialized ONCE as array columns — referencing ``split(text)``
    inside a lambda makes Catalyst re-evaluate the split per element
    (O(len²) per row), which is catastrophically slow on real documents."""
    words = F.split(F.col(text_col), " ")
    base = df.select(F.col(id_col), F.col(text_col), words.alias("__w"))
    parts = ", ".join(f"element_at(__w, i + {j})" for j in range(k))
    sh = (
        f"CASE WHEN size(__w) >= {k} THEN "
        f"transform(sequence(1, size(__w) - {k - 1}), i -> concat_ws(' ', {parts})) "
        f"ELSE array(`{text_col}`) END"
    )
    return base.select(F.col(id_col), F.expr(sh).alias("__sh"))


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bands: int = 4, k: int = 3
) -> DataFrame:
    """(id, mh_0..mh_{bands-1}): per-row projection, no shuffle. One
    MinHash value = min over word k-shingles of md5(band-salt || shingle);
    lexicographic min of a uniform hash is a valid MinHash, and md5 keeps
    it engine-portable."""
    sh = _shingles_df(df, text_col, id_col, k)
    cols = [F.col(id_col)] + [
        F.expr(f"array_min(transform(__sh, s -> md5(concat('b{b}|', s))))").alias(f"mh_{b}")
        for b in range(bands)
    ]
    return sh.select(*cols)


def lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 4,
    k: int = 3,
    max_bucket: int = 4096,
    two_pass: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing any band's MinHash.

    Scale shape: one shuffle on (band, hash) groups each bucket, pairs
    are expanded inside the group (no self-join, so the signature pass
    runs once — no cache needed), and a final distinct dedupes pairs
    that collide in several bands. Buckets larger than ``max_bucket``
    are dropped before expansion: a hot bucket (boilerplate pages
    sharing a band hash) would otherwise emit O(bucket²) pairs inside a
    single key — the classic LSH skew bomb. Dropped buckets are
    boilerplate by construction; exact dedup already handles identical
    text.

    ``two_pass=True`` pre-filters oversized buckets with a counted
    semi-join BEFORE collect_list, so a mega-bucket's id list is never
    materialized in executor memory — at the cost of computing the
    signature projection twice. Use it when bucket skew is extreme
    (boilerplate-heavy web corpora); the single-pass default only
    briefly materializes each oversized list before dropping it."""
    sig = minhash_signatures(df, text_col, id_col, bands, k)
    stacked = sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"mh_{b}").alias("h")) for b in range(bands)])
        ).alias("bh"),
    ).select(id_col, "bh.band", "bh.h")
    # null signatures (null text) must not form a bucket: groupBy keeps
    # NULL as a key, which would pair every null-text doc with every
    # other — join semantics (and the SQL oracle) exclude them
    stacked = stacked.filter(F.col("h").isNotNull())
    if two_pass:
        ok = (
            stacked.groupBy("band", "h")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter((F.col("__n") >= 2) & (F.col("__n") <= max_bucket))
            .select("band", "h")
        )
        grouped = (
            stacked.join(ok, ["band", "h"])  # co-partitioned: exchange reuse
            .groupBy("band", "h")
            .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        )
    else:
        grouped = (
            stacked.groupBy("band", "h")
            .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
            .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
        )
    # in-bucket pair expansion: ids sorted, so a < b holds by slicing
    pair_expr = (
        "flatten(transform(ids, (a, i) ->"
        " transform(slice(ids, i + 2, size(ids) - i - 1),"
        " b -> struct(a AS id_a, b AS id_b))))"
    )
    return (
        grouped.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bands: int = 4, k: int = 3
) -> DataFrame:
    """LSH candidates verified with exact word-k-shingle Jaccard."""
    pairs = lsh_pairs(df, text_col, id_col, bands, k)
    sh = _shingles_df(df, text_col, id_col, k).select(
        F.col(id_col), F.array_distinct(F.col("__sh")).alias("sh")
    )
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double")
            ).alias("jaccard"),
        )
    )
    return j


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over words: per bit, sign of the sum of ±1 votes
    from each distinct word's 64-bit hash (md5 prefix). Pure projection.

    NULL text yields NULL simhash, not 0: every per-bit CASE folds a
    NULL vote sum to its ELSE 0, so null-text documents (failed fetches
    — common at corpus scale) used to all land on simhash 0 and a
    downstream hamming-distance dedup would merge them into one fake
    near-dup mega-group. A document with no content has no signature."""
    hashes = (
        f"transform(array_distinct(split(`{text_col}`, ' ')),"
        f" w -> cast(conv(substring(md5(w), 1, 15), 16, 10) AS bigint))"
    )
    base = df.select(F.col(id_col), F.col(text_col).isNull().alias("__tnull"), F.expr(hashes).alias("__h"))
    # bit b of the simhash = 1 if sum over words of bit b (as ±1) > 0;
    # the word-hash array is materialized once, so the 60 bit aggregates
    # only fold precomputed bigints
    bit_terms = []
    for b in range(60):  # 60 usable bits from the 15-hex-digit prefix
        bit_terms.append(
            f"CASE WHEN aggregate(__h, 0L,"
            f" (acc, h) -> acc + CASE WHEN (h div {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) > 0"
            f" THEN {1 << b} ELSE 0 END"
        )
    expr = " + ".join(f"({t})" for t in bit_terms)
    return base.select(
        F.col(id_col),
        F.expr(f"CASE WHEN __tnull THEN CAST(NULL AS BIGINT) ELSE cast({expr} AS bigint) END").alias(
            "simhash"
        ),
    )


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 4096,
) -> DataFrame:
    """Near-duplicate pairs by SimHash hamming distance — the pairing
    operator :func:`simhash64` was missing (a signature column alone
    finds nothing). The standard block-banding scheme (Manku et al.,
    "Detecting Near-Duplicates for Web Crawling", WWW'07): split the
    60-bit fingerprint into ``max_hamming + 1`` blocks — two
    fingerprints within hamming distance t differ in at most t blocks,
    so by pigeonhole they share at least ONE block exactly — bucket-join
    on (block index, block value), expand candidate pairs in-bucket,
    then verify the EXACT hamming distance with ``bit_count(xor)``
    inside codegen. -> (id_a, id_b, hamming), id_a < id_b,
    hamming <= max_hamming.

    Scale shape mirrors :func:`lsh_pairs`: one shuffle on the block
    key, pair expansion inside each group (never a self-join of the
    corpus), ``max_bucket`` drops degenerate buckets BEFORE expansion
    (the skew bomb: near-constant pages collapse a block value into one
    key that would emit O(bucket²) pairs), and only verified pairs
    leave the operator. NULL-simhash rows (NULL text) never enter a
    bucket. Recall is exact within the cap: banding guarantees every
    qualifying pair shares a block, so the only misses are pairs whose
    every shared block sits in a dropped oversized bucket."""
    bits = 60
    blocks = max_hamming + 1
    if blocks > bits:
        raise ValueError(f"max_hamming {max_hamming} needs more blocks than {bits} bits")
    width = bits // blocks
    sig = simhash64(df, text_col, id_col).where(F.col("simhash").isNotNull())
    block_structs = []
    for b in range(blocks):
        w = width if b < blocks - 1 else bits - width * (blocks - 1)
        block_structs.append(
            F.struct(
                F.lit(b).alias("blk"),
                F.expr(f"(simhash div {1 << (b * width)}) % {1 << w}").alias("val"),
            )
        )
    stacked = sig.select(
        F.col(id_col), "simhash", F.explode(F.array(*block_structs)).alias("bv")
    ).select(id_col, "simhash", "bv.blk", "bv.val")
    grouped = (
        stacked.groupBy("blk", "val")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s")))
            ).alias("ms")
        )
        .filter((F.size("ms") >= 2) & (F.size("ms") <= max_bucket))
    )
    pair_expr = (
        "flatten(transform(ms, (a, i) ->"
        " transform(slice(ms, i + 2, size(ms) - i - 1),"
        " b -> struct(a.i AS id_a, b.i AS id_b, a.s AS sa, b.s AS sb))))"
    )
    # hamming verifies BEFORE the pair distinct: candidates failing the
    # test (the majority in a diverse corpus) never enter the distinct
    # exchange, and surviving rows shuffle (id, id, int) instead of two
    # extra 8-byte signatures
    return (
        grouped.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(
            "p.id_a",
            "p.id_b",
            F.expr("cast(bit_count(p.sa ^ p.sb) AS int)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: str = "pgs-split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment (the standard web-corpus
    split op): each row's bucket comes from md5(seed || id) — stable
    across runs, partitionings, engines, and corpus growth (a document
    keeps its split forever; sampling by position or rand() does not
    survive re-partitioning). Pure projection, no shuffle.

    ``fractions`` maps split name -> fraction (must sum to 1); buckets
    are half-open intervals over the 60-bit hash space in the dict's
    insertion order."""
    from pyspark.sql import functions as F

    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    space = float(1 << 60)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        cond = h < F.lit(int(acc * space))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)
