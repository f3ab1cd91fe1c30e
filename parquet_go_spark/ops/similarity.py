"""Similarity search over an embedding column (array<float>).

``cosine_topk`` is the exact brute-force baseline: the query set is
broadcast, scoring + per-partition top-k pruning run vectorized in numpy
(BLAS matmul) inside ``mapInPandas``, and only partitions × |Q| × k
candidate rows reach the final global top-k — the shuffle is tiny at any
scale. ``lsh_bucket_topk`` is the approximate scale path: random
hyperplane signatures bucket the vectors and only same-bucket candidates
are scored.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "cosine_topk",
    "lsh_bucket_topk",
    "ivf_topk",
    "pq_topk",
    "embedding_near_dups",
    "hyperplanes",
    "signature_sql",
    "ivf_centroids",
    "cell_scores_sql",
    "pq_codebooks",
    "pq_code_sql",
    "pq_scores_sql",
    "pq_lut_sql",
    "train_ivf_kmeans",
    "train_pq_kmeans",
    "train_pq_sample",
    "train_ivf_sample",
    "pq_sample_spark",
    "pq_sample_parquet",
    "save_quantizer",
    "load_quantizer",
    "list_quantizers",
]


def _quantizer_dir(enc_dir: str) -> str:
    import os

    return os.path.join(enc_dir, "quantizers")


def _vec_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector dimensionality from the first NON-NULL row, or None when
    the frame holds no usable vector. Every query builder used to read
    ``df.select(vec_col).first()[0]`` — a TypeError on an empty frame
    and a ``len(None)`` crash when the first row's embedding is NULL,
    both real occurrences in web-scale embedding tables (failed-encoder
    rows; the trainers already guarded for them, the query builders
    didn't)."""
    row = (
        df.where(F.col(vec_col).isNotNull())
        .select(F.size(F.col(vec_col)).alias("d"))
        .first()
    )
    return None if row is None else int(row[0])


def _empty_topk(df: DataFrame) -> DataFrame:
    """The (q_id, n_id, rank) result shape with zero rows — what a
    top-k query over an empty/all-null query set returns instead of
    crashing at dim inference."""
    return df.sparkSession.createDataFrame([], "q_id long, n_id long, rank int")


def save_quantizer(
    enc_dir: str,
    name: str = "default",
    centroids: np.ndarray | None = None,
    codebooks: np.ndarray | None = None,
    meta: dict | None = None,
) -> str:
    """Persist trained ANN quantizer constants next to the table, so
    production queries load them instead of retraining (the FAISS
    index-file analogue, table-format style: a JSON sidecar under
    ``<table>/quantizers/<name>.json``, written atomically via
    tmp+rename like every other commit in this repo).

    ``centroids`` = (dim, n_cells) from :func:`train_ivf_kmeans`;
    ``codebooks`` = (m, dim/m, n_codes) from :func:`train_pq_kmeans`.
    Values are stored at the same 6-decimal rounding the query builders
    use, so a save/load round-trip is bit-identical to passing the
    in-memory arrays. Returns the file path."""
    import json
    import os

    if centroids is None and codebooks is None:
        raise ValueError("save_quantizer: nothing to save")
    doc: dict = {"version": 1, "meta": meta or {}}
    if centroids is not None:
        c = np.round(np.asarray(centroids, dtype=np.float64), 6)
        doc["centroids"] = {"shape": list(c.shape), "values": c.reshape(-1).tolist()}
    if codebooks is not None:
        b = np.round(np.asarray(codebooks, dtype=np.float64), 6)
        doc["codebooks"] = {"shape": list(b.shape), "values": b.reshape(-1).tolist()}
    qdir = _quantizer_dir(enc_dir)
    os.makedirs(qdir, exist_ok=True)
    path = os.path.join(qdir, f"{name}.json")
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, path)
    return path


def load_quantizer(enc_dir: str, name: str = "default") -> dict:
    """-> {"centroids": np.ndarray | None, "codebooks": np.ndarray |
    None, "meta": dict} — drop-in kwargs for :func:`ivf_topk` /
    :func:`pq_topk` (``constants="broadcast"`` recommended at scale)."""
    import json
    import os

    path = os.path.join(_quantizer_dir(enc_dir), f"{name}.json")
    with open(path) as f:
        doc = json.load(f)
    out: dict = {"centroids": None, "codebooks": None, "meta": doc.get("meta", {})}
    for key in ("centroids", "codebooks"):
        if key in doc:
            spec = doc[key]
            out[key] = np.asarray(spec["values"], dtype=np.float64).reshape(spec["shape"])
    return out


def list_quantizers(enc_dir: str) -> list[str]:
    """Names of saved quantizers for a table, sorted."""
    import glob
    import os

    qdir = _quantizer_dir(enc_dir)
    return sorted(
        os.path.basename(p)[: -len(".json")] for p in glob.glob(os.path.join(qdir, "*.json"))
    )


def _scores_over(src: str, vec_expr: str, bias: bool = False) -> str:
    """Spark SQL: array of ``round(dot(vec, c_j), 6)`` for every
    centroid in ``src`` (an ``array<array<double>>`` expression — a
    nested literal OR a broadcast-carried column; the arithmetic and
    rounding are identical either way, which is what keeps the two
    constant-delivery modes rank-for-rank interchangeable).

    ``bias=True`` subtracts ``0.5·||c_j||²`` before rounding, turning
    argmax into exact nearest-centroid-by-L2 (``argmin ||x-c||² =
    argmax (x·c - ||c||²/2)``) — required for TRAINED codebooks whose
    raw k-means means are not unit-norm; for unit-norm constants the
    bias is a constant shift that cannot change the argmax."""
    dot = (
        f"aggregate(zip_with({vec_expr}, cj, (x, y) -> x * y),"
        " 0D, (acc, x) -> acc + x)"
    )
    if bias:
        nsq = "aggregate(zip_with(cj, cj, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
        return f"transform({src}, cj -> round({dot} - 0.5D * {nsq}, 6))"
    return f"transform({src}, cj -> round({dot}, 6))"


def _const_frame(spark, cents: np.ndarray | None = None, cb: np.ndarray | None = None):
    """One-row aux DataFrame carrying quantizer constants as DATA:
    ``__pgs_cents`` = (n_cells)x(dim) centroid lists, ``__pgs_cb`` =
    (m)x(n_codes)x(sub) codebook lists. Broadcast-cross-joined onto the
    corpus/query side, it replaces the ~K·dim-literal expression trees
    whose constant plan-compile cost dominates literal-heavy ANN
    queries at production scale — the per-row arithmetic is unchanged,
    the constants just ride a broadcast relation instead of the plan."""
    vals: list = []
    schema: list[str] = []
    if cents is not None:
        vals.append([[float(x) for x in cents[:, j]] for j in range(cents.shape[1])])
        schema.append("__pgs_cents array<array<double>>")
    if cb is not None:
        vals.append(
            [
                [[float(x) for x in cb[i, :, j]] for j in range(cb.shape[2])]
                for i in range(cb.shape[0])
            ]
        )
        schema.append("__pgs_cb array<array<array<double>>>")
    return spark.createDataFrame([tuple(vals)], ", ".join(schema))


def hyperplanes(dim: int, n_planes: int = 8, seed: int = 7) -> np.ndarray:
    """Deterministic random hyperplanes, rounded to 6 decimals so the
    exact same plane constants can be embedded as literals in any SQL
    engine (the DuckDB oracle mirrors the Spark plan bit-for-bit)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((dim, n_planes)), 6)


def signature_sql(planes: np.ndarray, vec_expr: str, dot_fn: str | None = None) -> str:
    """SQL expression for the hyperplane bucket signature of ``vec_expr``
    (an array<double>). ``dot_fn=None`` emits Spark's
    zip_with/aggregate fold; ``dot_fn="list_dot_product"`` emits the
    DuckDB equivalent."""
    terms = []
    for p in range(planes.shape[1]):
        lits = ", ".join(repr(float(x)) for x in planes[:, p])
        if dot_fn:
            dot = f"{dot_fn}({vec_expr}, [{lits}])"
        else:
            dot = (
                f"aggregate(zip_with({vec_expr}, array({lits}),"
                f" (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
            )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


def _sig_frame(df: DataFrame, planes: np.ndarray, id_col: str, vec_col: str) -> DataFrame:
    # NULL vectors can't be scored and would otherwise all collide into
    # signature bucket 0 (every CASE term folds NULL > 0 to the ELSE),
    # bloating that bucket with rows whose sims are NULL anyway; a
    # ZERO-NORM vector (failed encoder) has no direction and its cosine
    # division is a hard DIVIDE_BY_ZERO job kill under ANSI mode
    df = df.where(F.col(vec_col).isNotNull())
    return (
        df.select(
            F.col(id_col).alias("vid"),
            F.expr(f"transform(`{vec_col}`, x -> cast(x AS double))").alias("e"),
        )
        .select(
            "vid",
            "e",
            F.expr(signature_sql(planes, "e")).cast("long").alias("s"),
            F.expr(
                "sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, x) -> acc + x))"
            ).alias("nrm"),
        )
        .where(F.col("nrm") > 0)
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "lsh",
    n_planes: int = 8,
    seed: int = 7,
    max_bucket: int = 65536,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold), entirely JVM-side: zip_with/aggregate dot products inside
    whole-stage codegen, norms precomputed once.

    ``mode="lsh"`` (default, the scale path): candidates come from
    random-hyperplane buckets — the self-join keys on the 2^n_planes
    signature, so each row meets only its bucket (~n²/2^n_planes pairs,
    a SortMergeJoin on the bucket key, never a cartesian). Recall is the
    standard SimHash bound (near-identical vectors collide with high
    probability); the deterministic planes make the result exactly
    reproducible in any engine (see ``signature_sql``).

    ``mode="exact"`` is the all-pairs verifier — O(n²), only for small n
    or as the final scorer over externally generated candidates.

    ``max_bucket`` drops signature buckets larger than the cap BEFORE
    the self-join — the LSH skew bomb (a spike of identical/degenerate
    embeddings melts one join key into O(bucket²) pairs). The counts
    frame is at most 2^n_planes rows, so the pre-filter rides a
    broadcast join: no extra shuffle of the vector stream."""
    if mode == "lsh":
        dim = _vec_dim(df, vec_col)
        if dim is None:  # empty / all-null corpus: no pairs, not a crash
            return df.select(
                F.col(id_col).alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(0.0).alias("sim"),
            ).limit(0)
        v = _sig_frame(df, hyperplanes(dim, n_planes, seed), id_col, vec_col)
        if max_bucket is not None:
            ok = (
                v.groupBy("s")
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") <= max_bucket)
                .select("s")
            )
            v = v.join(F.broadcast(ok), "s")
        join_cond = (F.col("a.s") == F.col("b.s")) & (F.col("a.vid") < F.col("b.vid"))
    else:
        v = (
            df.where(F.col(vec_col).isNotNull())
            .select(
                F.col(id_col).alias("vid"),
                F.expr(f"transform(`{vec_col}`, x -> cast(x AS double))").alias("e"),
            )
            .withColumn(
                "nrm",
                F.expr(
                    "sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, x) -> acc + x))"
                ),
            )
            .where(F.col("nrm") > 0)  # ANSI DIVIDE_BY_ZERO guard, as in _sig_frame
        )
        join_cond = F.col("a.vid") < F.col("b.vid")
    a, b = v.alias("a"), v.alias("b")
    dot = "aggregate(zip_with(a.e, b.e, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    sim = F.expr(dot) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, join_cond)
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(sim, 4).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def _collect_queries(df: DataFrame, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    rows = df.where(F.col(vec_col).isNotNull()).select(id_col, vec_col).collect()
    if not rows:  # empty / all-null query set: callers return no matches
        return np.empty(0, dtype=np.int64), np.empty((0, 0), dtype=np.float64)
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    qv = np.array([list(r[1]) for r in rows], dtype=np.float64)
    order = np.argsort(qids)
    return qids[order], qv[order]


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of every query against ``df``.

    Returns (q_id, n_id, rank) with rank 1..k by descending cosine,
    ties broken by ascending n_id; self-matches excluded.
    """
    qids, qv = _collect_queries(queries, id_col, vec_col)
    if not len(qids):
        return _empty_topk(df)
    qn = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-30)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            # NULL embeddings can't be scored: drop the rows, not the job
            b = b[b[vec_col].notna()]
            if len(b) == 0:
                continue
            nids = b[id_col].to_numpy(dtype=np.int64)
            m = np.array(list(b[vec_col]), dtype=np.float64)
            mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
            sims = mn @ qn.T  # (batch, Q)
            kk = min(k + 1, len(nids))  # +1: self may be in the batch
            # per-query partial top-k within this partition. argpartition
            # keeps an ARBITRARY candidate set when sims tie across the
            # kk boundary (duplicate corpus vectors, or a degenerate
            # query scoring everything equal), so the documented
            # ascending-n_id tie-break could lose its winner before the
            # global window ever saw it — prune on the SAME (-sim, n_id)
            # order the window ranks by. argpartition first bounds the
            # lexsort to ~kk+boundary candidates at production batch
            # sizes; a full lexsort of the tail would be O(n log n) per
            # query for rows that can never rank.
            out_q, out_n, out_s = [], [], []
            for j in range(len(qids)):
                s = sims[:, j]
                if len(nids) > 4 * kk:
                    cand = np.argpartition(-s, 2 * kk - 1)[: 2 * kk]
                    # ties at the partition value can extend past the cut:
                    # include every index matching the worst kept sim
                    floor_sim = s[cand].min()
                    cand = np.flatnonzero(s >= floor_sim)
                else:
                    cand = np.arange(len(nids))
                idx = cand[np.lexsort((nids[cand], -s[cand]))][:kk]
                out_q.append(np.full(len(idx), qids[j], dtype=np.int64))
                out_n.append(nids[idx])
                out_s.append(s[idx])
            yield pd.DataFrame(
                {
                    "q_id": np.concatenate(out_q),
                    "n_id": np.concatenate(out_n),
                    "sim": np.concatenate(out_s),
                }
            )

    cand = df.mapInPandas(score, schema="q_id long, n_id long, sim double")
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        cand.filter(F.col("q_id") != F.col("n_id"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def ivf_centroids(dim: int, n_cells: int = 16, seed: int = 13) -> np.ndarray:
    """Deterministic unit-norm coarse-quantizer centroids, rounded to 6
    decimals so the identical constants embed as literals in any SQL
    engine (same cross-engine-parity trick as ``hyperplanes``). A seeded
    random quantizer, not k-means: at scale a trained quantizer slots in
    here unchanged (the assignment/probe plan is identical), but the
    oracle gate needs constants both engines share."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((dim, n_cells))
    c /= np.linalg.norm(c, axis=0, keepdims=True)
    return np.round(c, 6)


def cell_scores_sql(cents: np.ndarray, vec_expr: str, dot_fn: str | None = None) -> str:
    """SQL array expression of round(dot(vec, centroid_j), 6) per cell:
    ONE ``transform`` over a nested array literal of all centroids (one
    codegen loop — identical arithmetic to unrolled per-cell folds, ~J×
    smaller expression tree, so literal-heavy plans compile fast).
    ``dot_fn=None`` emits the Spark form; ``dot_fn="list_dot_product"``
    the DuckDB form. Rounding before the argmax/rank keeps cell
    assignment identical across engines."""
    rows = []
    for j in range(cents.shape[1]):
        lits = ", ".join(repr(float(x)) for x in cents[:, j])
        rows.append(f"[{lits}]" if dot_fn else f"array({lits})")
    if dot_fn:
        return (
            f"list_transform([{', '.join(rows)}],"
            f" cj -> round({dot_fn}({vec_expr}, cj), 6))"
        )
    # Spark form delegates to the SAME body builder the broadcast mode
    # uses — the literal/broadcast bit-parity is structural, not two
    # hand-maintained copies that could drift
    return _scores_over(f"array({', '.join(rows)})", vec_expr)


def train_ivf_kmeans(
    df: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    seed: int = 13,
    max_iter: int = 20,
    sample_rows: int | None = 200_000,
) -> np.ndarray:
    """Train the IVF coarse quantizer with distributed k-means (MLlib
    kmeans||) over L2-NORMALIZED vectors — spherical k-means, so the
    unit-normalized centers order cells by angle and ``ivf_topk``'s
    argmax-dot assignment is exactly nearest-centroid-by-cosine.

    -> (dim, n_cells) centroid matrix, drop-in for the ``centroids``
    parameter of :func:`ivf_topk` (the assignment/probe plan is
    identical to the seeded random quantizer; only recall improves,
    because trained cells follow the corpus density).

    Scale shape: one MLlib kmeans|| fit — Spark's parallel k-means++
    init plus ``max_iter`` Lloyd rounds, each one map-side partial
    aggregation over the (optionally sampled) corpus; the model itself
    is dim x n_cells doubles on the driver."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    nrm = (
        f"sqrt(aggregate(zip_with(`{vec_col}`, `{vec_col}`, (x, y) ->"
        " cast(x as double) * y), 0D, (acc, x) -> acc + x))"
    )
    # drop zero-norm vectors (failed-encoder rows are a real occurrence
    # in web-scale embedding tables) BEFORE normalizing: dividing by
    # nullif(0) yields an array of null ELEMENTS — a non-null value that
    # na.drop keeps and the KMeans fit then chokes on
    feats = (
        df.where(F.col(vec_col).isNotNull())
        .where(F.expr(nrm) > 0)
        .select(
            array_to_vector(
                F.expr(f"transform(`{vec_col}`, x -> cast(x as double) / {nrm})")
            ).alias("features")
        )
    )
    if sample_rows is not None:
        total = feats.count()
        if total > sample_rows:
            feats = feats.sample(fraction=sample_rows / total, seed=seed)
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    cents = np.asarray(model.clusterCenters(), dtype=np.float64).T  # (dim, cells)
    norms = np.linalg.norm(cents, axis=0, keepdims=True)
    norms[norms == 0] = 1.0
    return np.round(cents / norms, 6)


def ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
    centroids: np.ndarray | None = None,
    constants: str = "literal",
) -> DataFrame:
    """Approximate cosine top-k via an IVF (inverted-file) index: every
    corpus vector is assigned to its argmax-dot coarse cell in one
    projection (no shuffle of the corpus), each query probes its
    ``n_probe`` best cells, and the exact scorer runs only over probed
    cells — each corpus row meets ~|Q|·n_probe/n_cells queries through a
    broadcast join on the cell id.

    This is the complementary scale path to ``lsh_bucket_topk``: LSH
    buckets by signature equality (recall from collision probability),
    IVF buckets by quantizer proximity (recall tuned by n_probe with the
    standard nprobe/ncells trade-off). All constants are deterministic
    literals, so the DuckDB oracle reproduces the result exactly.

    ``centroids`` (a (dim, n_cells) matrix, e.g. from
    :func:`train_ivf_kmeans`) replaces the seeded random quantizer with
    a trained one — same plan, better recall at scale.

    ``constants="broadcast"`` ships the centroid matrix as DATA on a
    one-row broadcast aux frame instead of a nested literal: identical
    doubles, identical rounding, identical ranks — but the expression
    tree stays O(1) in n_cells·dim, eliminating the constant
    plan-compile cost that dominates literal-heavy plans (the
    production mode; ``"literal"`` remains the cross-engine oracle
    fixture mode)."""
    dim = _vec_dim(queries, vec_col)
    if dim is None:  # empty / all-null query set
        return _empty_topk(df)
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        if cents.shape[0] != dim:
            raise ValueError(f"centroids dim {cents.shape[0]} != vectors dim {dim}")
        n_cells = cents.shape[1]
    else:
        cents = ivf_centroids(dim, n_cells, seed)
    if constants == "broadcast":
        aux = F.broadcast(_const_frame(df.sparkSession, cents=cents))
        ds = _scores_over("__pgs_cents", "e")
    else:
        aux = None
        ds = cell_scores_sql(cents, "e")
    nrm = "sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, x) -> acc + x))"

    def base(d: DataFrame) -> DataFrame:
        # NULL vectors can't be assigned a cell or scored — and the
        # literal-source transform would yield a NON-null ds of NULL
        # scores, which posexplode+row_number then happily rank (a null
        # query used to come back with garbage "matches")
        d = d.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("vid"),
            F.expr(f"transform(`{vec_col}`, x -> cast(x AS double))").alias("e"),
        )
        if aux is not None:
            d = d.crossJoin(aux)
        # zero-norm guard: the candidate sim divides by nrm products,
        # a hard DIVIDE_BY_ZERO job kill under ANSI mode
        return d.select("vid", "e", F.expr(nrm).alias("nrm"), F.expr(ds).alias("ds")).where(
            F.col("nrm") > 0
        )

    v = base(df).select(
        "vid", "e", "nrm", F.expr("array_position(ds, array_max(ds))").cast("int").alias("cell")
    )
    qw = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("pos"))
    probes = (
        base(queries)
        .select(
            F.col("vid").alias("q_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qnrm"),
            F.posexplode("ds").alias("pos", "score"),
        )
        .withColumn("pr", F.row_number().over(qw))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "qe", "qnrm", (F.col("pos") + 1).alias("cell"))
    )
    dot = "aggregate(zip_with(a.e, p.qe, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    cand = (
        v.alias("a")
        .join(
            F.broadcast(probes.alias("p")),
            (F.col("a.cell") == F.col("p.cell")) & (F.col("a.vid") != F.col("p.q_id")),
        )
        .select(
            "p.q_id",
            F.col("a.vid").alias("n_id"),
            F.round(F.expr(dot) / (F.col("a.nrm") * F.col("p.qnrm")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def pq_codebooks(dim: int, m: int = 8, n_codes: int = 16, seed: int = 17) -> np.ndarray:
    """Deterministic product-quantization codebooks: ``m`` subspaces of
    ``dim//m`` dims, ``n_codes`` unit-norm centroids each, rounded to 6
    decimals so the identical constants embed as literals in any SQL
    engine (the same cross-engine-parity trick as ``hyperplanes`` /
    ``ivf_centroids``). A seeded random codebook, not trained k-means:
    at scale per-subspace k-means slots in here unchanged (the
    code-assignment/ADC plan is identical), but the oracle gate needs
    constants both engines share. -> (m, dim//m, n_codes)."""
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    rng = np.random.default_rng(seed)
    cb = rng.standard_normal((m, dim // m, n_codes))
    cb /= np.linalg.norm(cb, axis=1, keepdims=True)
    return np.round(cb, 6)


def train_pq_kmeans(
    df: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    seed: int = 17,
    max_iter: int = 20,
    sample_rows: int | None = 200_000,
) -> np.ndarray:
    """Train product-quantization codebooks the FAISS way: ``m``
    INDEPENDENT k-means fits, one per subspace, each over that
    subspace's slice of the L2-normalized vectors (MLlib kmeans||,
    mirroring :func:`train_ivf_kmeans` for the coarse cells). Trained
    centers follow the corpus density inside each subspace, so ADC
    distances approximate true dots far better than the seeded
    unit-norm codebook — recall rises with zero plan change.

    -> (m, dim//m, n_codes), drop-in for :func:`pq_topk`'s
    ``codebooks`` parameter. Centers are raw cluster means (NOT
    re-normalized — they must approximate subvectors, not directions),
    rounded to 6 decimals for cross-engine parity. If a subspace
    yields fewer than ``n_codes`` distinct centers, the remainder is
    padded from the seeded codebook so the shape contract holds.

    Scale shape: ONE bounded sample + cache of the normalized corpus,
    then m kmeans|| fits over sliced columns of the cached frame — each
    fit is map-side partial aggregation; the model is m·sub·n_codes
    doubles on the driver."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = df.select(vec_col).first()
    if first is None:
        raise ValueError("train_pq_kmeans: empty corpus")
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    sub = dim // m
    nrm = (
        f"sqrt(aggregate(zip_with(`{vec_col}`, `{vec_col}`, (x, y) ->"
        " cast(x as double) * y), 0D, (acc, x) -> acc + x))"
    )
    # zero-norm vectors filtered BEFORE normalizing (see
    # train_ivf_kmeans: nullif(0) division yields null ELEMENTS inside a
    # non-null array, which na.drop keeps and the fit crashes on)
    en = (
        df.where(F.col(vec_col).isNotNull())
        .where(F.expr(nrm) > 0)
        .select(F.expr(f"transform(`{vec_col}`, x -> cast(x as double) / {nrm})").alias("en"))
    )
    if sample_rows is not None:
        total = en.count()
        if total > sample_rows:
            en = en.sample(fraction=sample_rows / total, seed=seed)
    en = en.cache()
    fallback = pq_codebooks(dim, m, n_codes, seed)
    out = np.empty((m, sub, n_codes), dtype=np.float64)
    try:
        for i in range(m):
            feats = en.select(
                array_to_vector(F.expr(f"slice(en, {i * sub + 1}, {sub})")).alias(
                    "features"
                )
            )
            model = KMeans(k=n_codes, seed=seed + i, maxIter=max_iter).fit(feats)
            cents = np.asarray(model.clusterCenters(), dtype=np.float64).T  # (sub, k)
            got = cents.shape[1]
            out[i, :, :got] = cents
            if got < n_codes:  # degenerate subspace: pad to contract shape
                out[i, :, got:] = fallback[i, :, got:]
    finally:
        en.unpersist()
    return np.round(out, 6)


def pq_sample_spark(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_ids: int = 256,
) -> np.ndarray:
    """Bounded, id-defined PQ training sample via Spark: the rows whose
    id is below ``sample_ids``, sorted by id — a deterministic set the
    oracle side (:func:`pq_sample_parquet`) reproduces byte-for-byte
    from the same table. The collect is bounded by construction
    (|sample| rows of one vector column — the FAISS ``train()`` shape:
    quantizers train on an in-memory sample, never the corpus).
    -> (n, dim) float64 (float32 parquet values widen exactly)."""
    rows = (
        df.where(F.col(id_col) < sample_ids)
        .where(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .collect()
    )
    rows.sort(key=lambda r: r[0])
    return np.asarray([list(r[1]) for r in rows], dtype=np.float64)


def pq_sample_parquet(
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_ids: int = 256,
) -> np.ndarray:
    """The engine-free twin of :func:`pq_sample_spark`: read the same
    id-defined sample straight from a parquet file with pyarrow, for
    oracle-side training without a SparkSession. Identical float64
    matrix (same rows, same order, same exact float32→float64
    widening)."""
    import pyarrow.parquet as pq_

    t = pq_.read_table(path, columns=[id_col, vec_col])
    pdf = t.to_pandas()
    pdf = pdf[pdf[id_col] < sample_ids]
    pdf = pdf[pdf[vec_col].notna()].sort_values(id_col)
    return np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)


def train_pq_sample(
    vectors: np.ndarray,
    m: int = 8,
    n_codes: int = 16,
    seed: int = 17,
    iters: int = 10,
) -> np.ndarray:
    """Deterministic in-memory PQ training: ``m`` independent Lloyd
    k-means fits over the L2-normalized sample's subspace slices, pure
    numpy with seeded-choice init and fixed iteration count — so the
    SAME codebooks come out of the Spark query side and the DuckDB
    oracle side when both feed it the same sample (the reproducibility
    :func:`train_pq_kmeans`'s MLlib kmeans|| cannot give across
    engines: its init depends on partitioning). Ties in assignment
    break to the lowest code (argmin), empty clusters keep their
    previous center; centers are raw means (NOT re-normalized — they
    approximate subvectors, not directions), rounded to 6 decimals for
    cross-engine literal parity. -> (m, dim//m, n_codes), drop-in for
    :func:`pq_topk`'s ``codebooks``."""
    v = np.asarray(vectors, dtype=np.float64)
    if v.ndim != 2 or not len(v):
        raise ValueError("train_pq_sample: need a non-empty (n, dim) sample")
    dim = v.shape[1]
    if dim % m:
        raise ValueError(f"pq: dim {dim} not divisible by m {m}")
    sub = dim // m
    nrm = np.sqrt((v * v).sum(axis=1))
    v = v[nrm > 0] / nrm[nrm > 0, None]
    if not len(v):
        raise ValueError("train_pq_sample: all-zero sample")
    fallback = pq_codebooks(dim, m, n_codes, seed)
    out = np.empty((m, sub, n_codes), dtype=np.float64)
    for i in range(m):
        x = v[:, i * sub : (i + 1) * sub]  # (n, sub)
        rng = np.random.default_rng(seed + i)
        k = min(n_codes, len(x))
        cents = x[np.sort(rng.choice(len(x), k, replace=False))].copy()  # (k, sub)
        for _ in range(iters):
            # argmin ||x-c||^2 == argmax (x·c - ||c||^2/2); ties -> lowest code
            d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cents.T) + (cents * cents).sum(1)[None, :]
            assign = d2.argmin(axis=1)
            for j in range(k):
                sel = assign == j
                if sel.any():
                    cents[j] = x[sel].mean(axis=0)
        out[i, :, :k] = cents.T
        if k < n_codes:  # sample smaller than the codebook: pad to contract shape
            out[i, :, k:] = fallback[i, :, k:]
    return np.round(out, 6)


def train_ivf_sample(
    vectors: np.ndarray,
    n_cells: int = 16,
    seed: int = 13,
    iters: int = 20,
) -> np.ndarray:
    """Deterministic in-memory IVF coarse-quantizer training: spherical
    k-means in pure numpy (normalize → seeded-choice init → argmax-dot
    assignment with ties to the lowest cell → mean + renormalize), the
    engine-reproducible twin of :func:`train_ivf_kmeans` exactly as
    :func:`train_pq_sample` twins ``train_pq_kmeans``. Unit-norm
    centers keep ``ivf_topk``/``pq_topk``'s argmax-dot cell assignment
    = nearest-by-cosine. -> (dim, n_cells), rounded to 6 decimals."""
    v = np.asarray(vectors, dtype=np.float64)
    if v.ndim != 2 or not len(v):
        raise ValueError("train_ivf_sample: need a non-empty (n, dim) sample")
    nrm = np.sqrt((v * v).sum(axis=1))
    v = v[nrm > 0] / nrm[nrm > 0, None]
    if not len(v):
        raise ValueError("train_ivf_sample: all-zero sample")
    dim = v.shape[1]
    rng = np.random.default_rng(seed)
    k = min(n_cells, len(v))
    cents = v[np.sort(rng.choice(len(v), k, replace=False))].copy()  # (k, dim)
    for _ in range(iters):
        assign = (v @ cents.T).argmax(axis=1)  # ties -> lowest cell
        for j in range(k):
            sel = assign == j
            if sel.any():
                c = v[sel].mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cents[j] = c / n
    out = np.empty((dim, n_cells), dtype=np.float64)
    out[:, :k] = cents.T
    if k < n_cells:  # sample smaller than the cell count: pad seeded
        out[:, k:] = ivf_centroids(dim, n_cells, seed)[:, k:]
    return np.round(out, 6)


def _pq_scores_core(
    cb: np.ndarray, m_idx: int, vec_expr: str, dot_fn: str | None, bias: bool = False
) -> str:
    """SQL array of round(dot(subvector_m, centroid_j), 6) per code j —
    ONE ``transform`` over a nested array literal of all K centroids
    (one codegen loop) rather than K unrolled fold expressions: the
    arithmetic is identical, the expression tree is ~K× smaller, which
    is what dominates plan-compile time for literal-heavy ANN queries.

    ``bias=True`` subtracts ``0.5·||c_j||²`` before rounding (see
    ``_scores_over``): exact nearest-centroid assignment for TRAINED
    raw-mean codebooks, a constant shift for unit-norm ones."""
    sub = cb.shape[1]
    start = m_idx * sub
    rows = []
    for j in range(cb.shape[2]):
        lits = ", ".join(repr(float(x)) for x in cb[m_idx, :, j])
        rows.append(f"[{lits}]" if dot_fn else f"array({lits})")
    if dot_fn:  # DuckDB: 1-based inclusive slice, lambda list_transform
        sliced = f"{vec_expr}[{start + 1}:{start + sub}]"
        body = f"{dot_fn}({sliced}, cbj)"
        if bias:
            body = f"{body} - 0.5 * {dot_fn}(cbj, cbj)"
        return f"list_transform([{', '.join(rows)}], cbj -> round({body}, 6))"
    # Spark form delegates to the SAME body builder the broadcast mode
    # uses (see cell_scores_sql): identical fold, rounding, and bias
    # arithmetic by construction, so literal/broadcast rank parity
    # cannot drift between two hand-maintained copies
    sliced = f"slice({vec_expr}, {start + 1}, {sub})"
    return _scores_over(f"array({', '.join(rows)})", sliced, bias=bias)


def pq_scores_sql(
    cb: np.ndarray, m_idx: int, vec_expr: str, dot_fn: str | None = None, bias: bool = False
) -> str:
    """SQL array of subspace ``m_idx``'s rounded centroid dots — staged
    into a column so argmax reads it once instead of inlining the dot
    list twice."""
    return _pq_scores_core(cb, m_idx, vec_expr, dot_fn, bias=bias)


def pq_code_sql(cb: np.ndarray, m_idx: int, vec_expr: str, dot_fn: str | None = None) -> str:
    """SQL for subspace ``m_idx``'s code of the (normalized) vector:
    1-based nearest-centroid index via argmax of the L2-corrected dot
    (``x·c - ||c||²/2``, exact argmin-distance for any codebook norm) —
    first-max tie rule is identical in Spark (``array_position``) and
    DuckDB (``list_position``)."""
    lst = pq_scores_sql(cb, m_idx, vec_expr, dot_fn, bias=True)
    if dot_fn:
        return f"CAST(list_position({lst}, list_max({lst})) AS INT)"
    return f"CAST(array_position({lst}, array_max({lst})) AS INT)"


def pq_lut_sql(cb: np.ndarray, m_idx: int, vec_expr: str, dot_fn: str | None = None) -> str:
    """SQL for the query-side ADC lookup table of subspace ``m_idx``:
    floor(round(dot, 6) * 1e6) per code as BIGINT — integer partial
    scores, so the ADC sum is exact and identically ordered in every
    engine (float summation order can never flip a rank)."""
    scores = _pq_scores_core(cb, m_idx, vec_expr, dot_fn)
    if dot_fn:
        return f"list_transform({scores}, d -> CAST(floor(d * 1000000) AS BIGINT))"
    return f"transform({scores}, d -> CAST(floor(d * 1000000) AS BIGINT))"


def pq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    n_cells: int = 16,
    n_probe: int = 4,
    rerank: int | None = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 17,
    cell_seed: int = 13,
    codebooks: np.ndarray | None = None,
    centroids: np.ndarray | None = None,
    constants: str = "literal",
) -> DataFrame:
    """Approximate cosine top-k via IVF-ADC (the FAISS IVFADC shape):
    corpus vectors are coarse-quantized to a cell AND product-quantized
    to ``m`` one-byte codes in ONE projection (no corpus shuffle);
    queries probe their ``n_probe`` best cells carrying per-subspace
    integer lookup tables; scoring a candidate is ``m`` table lookups
    summed in int64 — the compressed-domain complement to the exact
    scorer (``cosine_topk`` reads full vectors, this reads ~m bytes per
    row). ``rerank=R`` keeps the standard final stage: the top-R ADC
    shortlist per query is re-scored EXACTLY (full vectors touched for
    only |Q|·R rows via a broadcast semi-join — recall recovers to the
    coarse-cell ceiling while the scan stays compressed-domain);
    ``rerank=None`` ranks by raw ADC scores.

    Scale shape: each corpus row meets ~|Q|·n_probe/n_cells probes via
    the broadcast cell join, per-candidate work is O(m) integer adds
    (vs O(dim) float muls), and only the top-k window's survivors
    shuffle. All codebooks/centroids are deterministic literals and the
    ADC scores are integers, so the DuckDB oracle reproduces ranks
    bit-for-bit (no float summation-order hazard).

    ``codebooks`` ((m, dim//m, n_codes), e.g. :func:`train_pq_kmeans`)
    and ``centroids`` ((dim, n_cells), e.g. :func:`train_ivf_kmeans`)
    swap the seeded constants for trained ones — same plan, better
    recall. ``constants="broadcast"`` ships whichever constants are in
    play as DATA on a one-row broadcast aux frame instead of nested
    literals: identical doubles and rounding → identical ranks, but the
    expression tree stays O(1) in the constant count, removing the
    plan-compile cost that dominates the literal mode (the production
    path; ``"literal"`` remains the cross-engine oracle fixture)."""
    dim = _vec_dim(queries, vec_col)
    if dim is None:  # empty / all-null query set
        return _empty_topk(df)
    if codebooks is not None:
        cb = np.asarray(codebooks, dtype=np.float64)
        if cb.ndim != 3 or cb.shape[0] * cb.shape[1] != dim:
            raise ValueError(f"codebooks shape {cb.shape} incompatible with dim {dim}")
        m, n_codes = cb.shape[0], cb.shape[2]
    else:
        cb = pq_codebooks(dim, m, n_codes, seed)
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        if cents.shape[0] != dim:
            raise ValueError(f"centroids dim {cents.shape[0]} != vectors dim {dim}")
        n_cells = cents.shape[1]
    else:
        cents = ivf_centroids(dim, n_cells, cell_seed)
    sub = dim // m
    if constants == "broadcast":
        aux = F.broadcast(_const_frame(df.sparkSession, cents=cents, cb=cb))
        ds = _scores_over("__pgs_cents", "e")

        def _cs(i: int) -> str:
            return _scores_over(
                f"element_at(__pgs_cb, {i + 1})",
                f"slice(en, {i * sub + 1}, {sub})",
                bias=True,
            )

        def _lut(i: int) -> str:
            # pure dots (NO assignment bias): ADC sums estimate
            # dot(q, reconstruction), the L2 correction applies only to
            # choosing the code
            scores = _scores_over(
                f"element_at(__pgs_cb, {i + 1})", f"slice(en, {i * sub + 1}, {sub})"
            )
            return f"transform({scores}, d -> CAST(floor(d * 1000000) AS BIGINT))"

    else:
        aux = None
        ds = cell_scores_sql(cents, "e")

        def _cs(i: int) -> str:
            return pq_scores_sql(cb, i, "en", bias=True)

        def _lut(i: int) -> str:
            return pq_lut_sql(cb, i, "en")

    nrm = "sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), 0D, (acc, x) -> acc + x))"

    def base(d: DataFrame) -> DataFrame:
        # NULL vectors: same garbage-ranks hazard as ivf_topk's base
        d = d.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("vid"),
            F.expr(f"transform(`{vec_col}`, x -> cast(x AS double))").alias("e"),
        )
        if aux is not None:
            d = d.crossJoin(aux)
        # zero-norm guard: the rerank sim divides by nrm products (ANSI
        # DIVIDE_BY_ZERO), and a zero vector has no direction to code
        return (
            d.withColumn("nrm", F.expr(nrm))
            .where(F.col("nrm") > 0)
            .withColumn("en", F.expr("transform(e, x -> x / nullif(nrm, 0D))"))
        )

    v = base(df).withColumn("ds", F.expr(ds))
    for i in range(m):
        v = v.withColumn(f"cs{i}", F.expr(_cs(i)))
    v = v.select(
        "vid",
        F.expr("array_position(ds, array_max(ds))").cast("int").alias("cell"),
        F.array(
            *[
                F.expr(f"CAST(array_position(cs{i}, array_max(cs{i})) AS INT)")
                for i in range(m)
            ]
        ).alias("codes"),
    )
    qw = Window.partitionBy("q_id").orderBy(F.desc("score"), F.asc("pos"))
    probes = (
        base(queries)
        .select(
            F.col("vid").alias("q_id"),
            F.array(*[F.expr(_lut(i)) for i in range(m)]).alias("luts"),
            F.posexplode(F.expr(ds)).alias("pos", "score"),
        )
        .withColumn("pr", F.row_number().over(qw))
        .filter(F.col("pr") <= n_probe)
        .select("q_id", "luts", (F.col("pos") + 1).alias("cell"))
    )
    adc = "aggregate(zip_with(a.codes, p.luts, (c, l) -> element_at(l, c)), 0L, (acc, x) -> acc + x)"
    cand = (
        v.alias("a")
        .join(
            F.broadcast(probes.alias("p")),
            (F.col("a.cell") == F.col("p.cell")) & (F.col("a.vid") != F.col("p.q_id")),
        )
        .select("p.q_id", F.col("a.vid").alias("n_id"), F.expr(adc).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    if rerank is None:
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "n_id", "rank")
        )
    shortlist = cand.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= rerank)
    qfull = base(queries).select(
        F.col("vid").alias("q_id"), F.col("e").alias("qe"), F.col("nrm").alias("qnrm")
    )
    exact = (
        base(df)
        .select("vid", "e", "nrm")
        .join(F.broadcast(shortlist), F.col("vid") == F.col("n_id"))
        .join(F.broadcast(qfull), "q_id")
        .select(
            "q_id",
            "n_id",
            F.round(
                F.expr("aggregate(zip_with(e, qe, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
                / (F.col("nrm") * F.col("qnrm")),
                6,
            ).alias("sim"),
        )
    )
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )


def lsh_bucket_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k: random-hyperplane LSH buckets, then the
    exact scorer over same-bucket candidates only — entirely JVM-side.

    The query side (tiny) is broadcast and joined on the bucket
    signature, so the corpus is never shuffled: each row is scored only
    against queries sharing its bucket (~|Q|/2^n_planes per row), and
    only the surviving candidates (≪ n) reach the per-query top-k
    window. Deterministic plane literals (``hyperplanes``) make the
    whole computation reproducible in any SQL engine; sims are rounded
    to 6 decimals before ranking so cross-engine summation-order noise
    cannot reorder ties."""
    dim = _vec_dim(queries, vec_col)
    if dim is None:  # empty / all-null query set
        return _empty_topk(df)
    planes = hyperplanes(dim, n_planes, seed)
    v = _sig_frame(df, planes, id_col, vec_col)
    q = _sig_frame(queries, planes, id_col, vec_col).select(
        F.col("vid").alias("q_id"),
        F.col("e").alias("qe"),
        F.col("s").alias("qs"),
        F.col("nrm").alias("qnrm"),
    )
    dot = "aggregate(zip_with(e, qe, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    cand = (
        v.join(F.broadcast(q), (F.col("s") == F.col("qs")) & (F.col("vid") != F.col("q_id")))
        .select(
            "q_id",
            F.col("vid").alias("n_id"),
            F.round(F.expr(dot) / (F.col("nrm") * F.col("qnrm")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "rank")
    )
