"""Distributed table_column_stats / table_numeric_minmax (round-5
rewrite of the coalesce(1) single-task funnel — VERDICT r4 item #1).

Pins: (1) exact parity with SQL COUNT(DISTINCT) across a multi-partition
scan, (2) the plan carries NO Coalesce/single-partition funnel and the
partial pass runs over >1 partition, (3) the KMV sketch kernel is exact
below k, merges associatively, and estimates within ~1% above k,
(4) minmax semantics (NaN-as-null, all-null columns) survive the
partial/merge split, (5) manifest KMV sketches answer table-level
distinct counts with zero data pages read."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from parquet_go_spark.kernels.kmv import (
    hash_column_values,
    kmv_count,
    kmv_deserialize,
    kmv_from_hashes,
    kmv_merge,
    kmv_serialize,
)

pytestmark = pytest.mark.spark

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------ kernel level
def test_kmv_exact_below_k():
    h = np.arange(1000, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    state, trunc = kmv_from_hashes(h, k=2048)
    assert not trunc
    assert kmv_count(state, trunc, k=2048) == 1000


def test_kmv_serialize_roundtrip():
    h = np.array([5, 1, 1, 9], dtype=np.uint64)
    state, trunc = kmv_from_hashes(h, k=16)
    s2, t2 = kmv_deserialize(kmv_serialize(state, trunc))
    assert t2 == trunc and np.array_equal(s2, state)
    assert kmv_deserialize(b"")[0].size == 0


def test_kmv_merge_exact_union():
    a, ta = kmv_from_hashes(np.array([1, 2, 3], np.uint64), k=8)
    b, tb = kmv_from_hashes(np.array([3, 4], np.uint64), k=8)
    state, trunc = kmv_merge([a, b], [ta, tb], k=8)
    assert not trunc and kmv_count(state, trunc, k=8) == 4


def test_kmv_merge_order_invariant():
    rng = np.random.default_rng(7)
    parts = [rng.integers(0, 1 << 63, 500).astype(np.uint64) for _ in range(4)]
    sk = [kmv_from_hashes(p, k=256) for p in parts]
    c1 = kmv_count(*kmv_merge([s for s, _ in sk], [t for _, t in sk], k=256), k=256)
    rev = sk[::-1]
    c2 = kmv_count(*kmv_merge([s for s, _ in rev], [t for _, t in rev], k=256), k=256)
    assert c1 == c2


def test_kmv_estimate_accuracy():
    rng = np.random.default_rng(42)
    n = 200_000
    h = rng.integers(0, 1 << 63, n).astype(np.uint64) << np.uint64(1)
    true = len(np.unique(h))
    state, trunc = kmv_from_hashes(h, k=4096)
    assert trunc
    est = kmv_count(state, trunc, k=4096)
    assert abs(est - true) / true < 0.05  # 1/sqrt(k) ~ 1.6%


def test_kmv_merge_mixed_k_clips_to_tightest():
    # r5 review finding: merging a truncated sketch built at a SMALL k
    # under a caller's LARGER k must clip the union to the tight input's
    # retained window — the input discarded every hash above its own
    # k-th minimum, so positions beyond it in the union are not the
    # "smallest m hashes of the stream" and the estimator collapses
    # (250x undercount in the failure scenario) without the clip.
    rng = np.random.default_rng(3)
    big = np.unique(rng.integers(0, 1 << 64, 300_000, dtype=np.uint64))
    small = np.unique(rng.integers(1 << 63, 1 << 64, 600, dtype=np.uint64))
    a, ta = kmv_from_hashes(big, k=1024)  # truncated at 1024
    b, tb = kmv_from_hashes(small, k=1 << 14)  # exact, but hashes are LARGE
    assert ta and not tb
    state, trunc = kmv_merge([a, b], [ta, tb], k=1 << 14)
    assert trunc and len(state) <= 1024
    true = len(np.unique(np.concatenate([big, small])))
    est = kmv_count(state, trunc, k=1 << 14)
    assert abs(est - true) / true < 0.15, (est, true)


def test_hash_column_values_float_bits():
    from parquet_go_spark.core.columns import ColumnData

    v = np.array([1.5, 1.5, -0.0, 0.0, np.nan], dtype=np.float64)
    cd = ColumnData("double", np.ones(5, bool), values=v)
    h = hash_column_values(cd)
    # bit-pattern identity: -0.0 != 0.0, repeated 1.5 collapses
    assert len(np.unique(h)) == 4


# ------------------------------------------------------------- spark level
def _stats_pdf(spark, df, **kw):
    from parquet_go_spark.ops.stats import table_column_stats

    return (
        table_column_stats(df, **kw).toPandas().set_index("col_name").sort_index()
    )


def test_stats_match_sql_multi_partition(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(8)
    got = _stats_pdf(spark, df)
    pdf = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    for c in pdf.columns:
        s = pdf[c]
        assert got.loc[c, "num_rows"] == len(s)
        assert got.loc[c, "null_count"] == int(s.isna().sum())
        assert got.loc[c, "n_distinct"] == int(s.dropna().nunique()), c


def test_stats_plan_has_no_single_task_funnel(spark):
    from parquet_go_spark.ops.stats import table_column_stats, table_numeric_minmax

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    for op in (
        table_column_stats(df),
        table_numeric_minmax(df, ["l_quantity"]),
    ):
        plan = op._jdf.queryExecution().executedPlan().toString()
        assert "Coalesce" not in plan, plan
        # partial pass must run over the scan's own partitioning
        assert df.rdd.getNumPartitions() >= 1


def test_stats_exercises_multiple_tasks(spark):
    # sketches really merge across partitions: force a known split and
    # verify each partition contributed (partial count == partitions
    # with rows for a never-null column)
    from parquet_go_spark.ops.stats import table_column_stats

    df = spark.range(0, 10_000, 1, 8).selectExpr("id % 97 AS v", "id")
    got = table_column_stats(df).toPandas().set_index("col_name")
    assert got.loc["v", "n_distinct"] == 97
    assert got.loc["id", "n_distinct"] == 10_000
    assert got.loc["id", "num_rows"] == 10_000


def test_stats_tree_merge_plan_shape(spark):
    # r5 review findings: (a) with P partitions the final per-column
    # merge held P sketches (bytes-funnel OOM at 100 TB) — a salted
    # combine level bounds every task's fan-in; (b) gating that level on
    # df.rdd.getNumPartitions() cost a physical-planning pass per call
    # and read the pre-AQE count; (c) batch 8: salt = pid % fanout
    # rebuilt the funnel one level down (each combine task held P/fanout
    # sketches) — the tree is now TWO bounded levels (pid // fanout,
    # then a mixed fold of the group ids) + the readout: three
    # FlatMapGroupsInPandas at every P, one plan shape, results exact
    # below k.
    from parquet_go_spark.ops.stats import _MERGE_FANOUT, table_column_stats

    df = spark.range(0, 20_000, 1, _MERGE_FANOUT + 16).selectExpr(
        "id % 397 AS v", "id"
    )
    op = table_column_stats(df)
    plan = op._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 3, plan
    got = op.toPandas().set_index("col_name")
    assert got.loc["v", "n_distinct"] == 397
    assert got.loc["id", "n_distinct"] == 20_000
    assert got.loc["id", "num_rows"] == 20_000

    # same shape below the fanout — no partition-count-dependent plans
    few = spark.range(0, 1000, 1, 4).selectExpr("id")
    plan2 = (
        table_column_stats(few)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan2.count("FlatMapGroupsInPandas") == 3, plan2


def test_stats_fold_salt_spreads_strided_group_ids():
    # batch 8: monotonically_increasing_id() // fanout group ids are
    # pid<<27-strided when partitions are small — a plain % fanout sends
    # EVERY group to bucket 0, rebuilding the single-task funnel. The
    # mixed fold must spread both consecutive and strided ids.
    from parquet_go_spark.ops.stats import _MERGE_FANOUT, _fold_salt

    consecutive = {_fold_salt(i) for i in range(4096)}
    strided = {_fold_salt(pid << 27) for pid in range(4096)}
    assert len(consecutive) == _MERGE_FANOUT
    assert len(strided) >= _MERGE_FANOUT // 2, len(strided)
    assert all(0 <= _fold_salt(x) < _MERGE_FANOUT for x in (0, 1, 2**63 - 1))


def test_stats_distinct_layout_independent(spark):
    # r5 review finding: exactness degraded only WHEN the tree engaged,
    # making n_distinct depend on partition count. Every merge level now
    # re-bounds at k, and the k smallest hashes of the stream are the
    # same under any partitioning — so above k the ESTIMATE must be
    # bit-identical across layouts, and below k both must be exact.
    from parquet_go_spark.ops.stats import _MERGE_FANOUT, table_column_stats

    for n, k in ((10_000, 2048), (1_500, 2048)):
        vals = []
        for p in (3, _MERGE_FANOUT + 8):
            df = spark.range(0, n, 1, p).selectExpr("id")
            got = table_column_stats(df, k=k).toPandas().set_index("col_name")
            vals.append(int(got.loc["id", "n_distinct"]))
        assert vals[0] == vals[1], (n, k, vals)
        if n <= k:
            assert vals[0] == n
        else:
            assert abs(vals[0] - n) / n < 0.15


def test_stats_tree_merge_estimate_above_k(spark):
    # overflow unions degrade to bounded truncated state at the combine
    # level instead of shipping full hash sets up the tree
    from parquet_go_spark.ops.stats import _MERGE_FANOUT, table_column_stats

    df = spark.range(0, 60_000, 1, _MERGE_FANOUT + 8).selectExpr("id")
    got = table_column_stats(df, k=2048).toPandas().set_index("col_name")
    est = got.loc["id", "n_distinct"]
    assert abs(est - 60_000) / 60_000 < 0.15, est


def test_stats_estimate_mode_kicks_in(spark):
    from parquet_go_spark.ops.stats import table_column_stats

    df = spark.range(0, 50_000, 1, 4).selectExpr("id")
    got = table_column_stats(df, k=1024).toPandas().set_index("col_name")
    est = got.loc["id", "n_distinct"]
    assert abs(est - 50_000) / 50_000 < 0.15


def test_minmax_nan_treated_as_null(spark):
    # pa.Table.from_pandas inside the op maps NaN -> null (identical to
    # the pre-r5 single-chunk path): NaN never reaches the extreme scan
    from parquet_go_spark.ops.stats import table_numeric_minmax

    df = spark.sql(
        "SELECT x FROM VALUES (1.0D), (double('NaN')), (3.0D), (2.0D) AS t(x)"
    ).repartition(3)
    got = table_numeric_minmax(df, ["x"]).toPandas()
    assert got["min_v"].iloc[0] == 1.0 and got["max_v"].iloc[0] == 3.0


def test_minmax_all_null_column(spark):
    from parquet_go_spark.ops.stats import table_numeric_minmax

    df = spark.sql("SELECT CAST(NULL AS double) AS x FROM range(10)").repartition(2)
    got = table_numeric_minmax(df, ["x"]).toPandas()
    assert got["min_v"].isna().all() and got["max_v"].isna().all()


def test_manifest_kmv_stats(spark, tmp_path):
    from parquet_go_spark.ops.stats import table_stats_from_manifest
    from parquet_go_spark.spark.encode_job import encode_table

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = str(tmp_path / "t")
    encode_table(
        df, out, partitions=4, kmv_columns=["o_orderkey", "o_custkey", "o_orderstatus"]
    ).collect()
    got = table_stats_from_manifest(spark, out).toPandas().set_index("col_name")
    pdf = df.toPandas()
    for c in ("o_orderkey", "o_custkey", "o_orderstatus"):
        assert got.loc[c, "num_rows"] == len(pdf)
        assert got.loc[c, "n_distinct"] == pdf[c].dropna().nunique(), c
    # columns encoded without a sketch must answer NULL, never a lie
    assert pd.isna(got.loc["o_orderpriority", "n_distinct"])
    assert got.loc["o_orderpriority", "num_rows"] == len(pdf)


def test_manifest_kmv_estimate_over_chunks(spark, tmp_path):
    from parquet_go_spark.ops.stats import table_stats_from_manifest
    from parquet_go_spark.spark.encode_job import encode_table

    df = spark.range(0, 40_000, 1, 4).selectExpr("id")
    out = str(tmp_path / "big")
    encode_table(df, out, kmv_columns=["id"], kmv_k=1024).collect()
    got = table_stats_from_manifest(spark, out, k=1024).toPandas().set_index("col_name")
    est = got.loc["id", "n_distinct"]
    assert abs(est - 40_000) / 40_000 < 0.15


def test_minmax_matches_previous_semantics(spark):
    from parquet_go_spark.ops.stats import table_numeric_minmax

    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(5)
    got = (
        table_numeric_minmax(df, ["l_quantity", "l_extendedprice"])
        .toPandas()
        .set_index("col_name")
    )
    pdf = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").toPandas()
    for c in ("l_quantity", "l_extendedprice"):
        assert got.loc[c, "min_v"] == pytest.approx(float(pdf[c].min()))
        assert got.loc[c, "max_v"] == pytest.approx(float(pdf[c].max()))


def test_cli_stats_both_modes(spark, tmp_path, capsys):
    # the CLI face of the distributed/manifest stats paths: encode with
    # --kmv-columns, then `stats --from-manifest` (zero data pages) and
    # `stats` (distributed scan) must agree exactly on this small table
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_spark.cli import main

    src = str(tmp_path / "src.parquet")
    enc = str(tmp_path / "enc")
    t = pa.table(
        {
            "id": pa.array(range(400), pa.int64()),
            "lang": pa.array([["en", "de", None][i % 3] for i in range(400)]),
        }
    )
    pq.write_table(t, src)
    rc = main(
        ["encode", "--input", src, "--out", enc, "--partitions", "3",
         "--kmv-columns", "id,lang"]
    )
    assert rc == 0
    capsys.readouterr()

    def run_stats(*extra):
        assert main(["stats", "--enc", enc, *extra]) == 0
        return {
            json.loads(l)["col_name"]: json.loads(l)
            for l in capsys.readouterr().out.strip().splitlines()
        }

    man = run_stats("--from-manifest")
    scan = run_stats()
    for col, nd, nulls in (("id", 400, 0), ("lang", 2, 133)):
        assert man[col]["n_distinct"] == nd and scan[col]["n_distinct"] == nd
        assert man[col]["null_count"] == nulls == scan[col]["null_count"]
        assert man[col]["num_rows"] == 400 == scan[col]["num_rows"]

    # --columns restricts BOTH modes to the subset (and, in manifest
    # mode, restricts the merge work itself — the filter rides the
    # manifest scan, not a post-hoc projection)
    man_sub = run_stats("--from-manifest", "--columns", "lang")
    scan_sub = run_stats("--columns", "lang")
    assert set(man_sub) == set(scan_sub) == {"lang"}
    assert man_sub["lang"] == man["lang"]
    assert scan_sub["lang"] == scan["lang"]


def test_stats_fold_across_arrow_batches(spark):
    """One partition, many Arrow batches (session fixture batches at
    8192 rows): the partial stage folds per batch — O(k) memory, never a
    concat of the whole partition — and the fold must be value-identical
    to the single-table path (num_rows/null_count sum, KMV re-bounds)."""
    from parquet_go_spark.ops.stats import table_column_stats, table_numeric_minmax

    df = spark.range(0, 20000, 1, 1).selectExpr(
        "id % 97 AS v", "CASE WHEN id % 10 = 0 THEN NULL ELSE id % 7 END AS w"
    )
    out = {r["col_name"]: r for r in table_column_stats(df).collect()}
    assert out["v"]["num_rows"] == 20000
    assert out["v"]["n_distinct"] == 97 and out["v"]["null_count"] == 0
    assert out["w"]["null_count"] == 2000 and out["w"]["n_distinct"] == 7

    mm = {r["col_name"]: r for r in table_numeric_minmax(df, ["v"]).collect()}
    assert mm["v"]["min_v"] == 0.0 and mm["v"]["max_v"] == 96.0


def test_column_stats_nan_as_null_and_arrow_partials(spark):
    """The mapInArrow partials (no pandas hop) must keep the op's
    NaN-as-null semantics EXPLICITLY: the old mapInPandas path folded
    NaN into null as a conversion side effect; Arrow keeps NaN a value,
    so the fold now lives in the partial itself — null_count includes
    NaN, the distinct sketch excludes it, at any partitioning."""
    from parquet_go_spark.ops.stats import table_column_stats

    df = spark.sql(
        "SELECT x FROM VALUES (1.0D), (double('NaN')), (double('NaN')), "
        "(2.0D), (CAST(NULL AS double)) AS t(x)"
    ).repartition(3)
    got = table_column_stats(df, ["x"]).toPandas().set_index("col_name")
    assert int(got.loc["x", "num_rows"]) == 5
    assert int(got.loc["x", "null_count"]) == 3  # 1 null + 2 NaN
    assert int(got.loc["x", "n_distinct"]) == 2  # {1.0, 2.0}
    # plan shape: the partial pass is MapInArrow (no pandas boxing of
    # the scanned values), the merge levels stay applyInPandas
    plan = table_column_stats(df, ["x"])._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan, plan
