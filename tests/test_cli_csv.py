"""CSV ingestion through the CLI (reference ``cmd/csv2parquet`` analogue):
headered CSV + type hints → encoded table, decoded back typed."""

from __future__ import annotations

import json

import pytest

from parquet_go_spark.cli import main
from parquet_go_spark.spark.decode_job import decode_table

pytestmark = pytest.mark.spark


def _write_csv(path):
    rows = ["id,name,score,flag,blob"]
    for i in range(50):
        rows.append(f"{i},user-{i},{i / 4},{'true' if i % 2 else 'false'},b{i:03d}")
    path.write_text("\n".join(rows) + "\n")


def test_encode_csv_with_typehints(spark, tmp_path, capsys):
    csv = tmp_path / "in.csv"
    _write_csv(csv)
    out = str(tmp_path / "enc")
    rc = main(
        [
            "encode",
            "--input",
            str(csv),
            "--input-format",
            "csv",
            "--typehints",
            "id=int64,score=double,flag=boolean,blob=byte_array",
            "--out",
            out,
            "--key-col",
            "id",
            "--partitions",
            "2",
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows"] == 50

    back = decode_table(spark, out)
    assert dict(back.dtypes) == {
        "id": "bigint",
        "name": "string",
        "score": "double",
        "flag": "boolean",
        "blob": "binary",
    }
    got = {r["id"]: r for r in back.collect()}
    assert got[7]["score"] == 7 / 4
    assert got[7]["flag"] is True
    assert got[8]["flag"] is False
    assert got[9]["blob"] == b"b009"
    assert got[9]["name"] == "user-9"


def test_encode_csv_semicolon_delimiter_and_default_string(spark, tmp_path, capsys):
    csv = tmp_path / "semi.csv"
    csv.write_text("a;b\n1;x\n2;y\n")
    out = str(tmp_path / "enc2")
    rc = main(
        ["encode", "--input", str(csv), "--input-format", "csv", "--delimiter", ";", "--out", out]
    )
    assert rc == 0
    back = decode_table(spark, out)
    assert dict(back.dtypes) == {"a": "string", "b": "string"}
    assert {(r["a"], r["b"]) for r in back.collect()} == {("1", "x"), ("2", "y")}


def test_encode_csv_bad_typehint(tmp_path):
    csv = tmp_path / "bad.csv"
    csv.write_text("a\n1\n")
    with pytest.raises(SystemExit, match="valid types"):
        main(
            [
                "encode",
                "--input",
                str(csv),
                "--input-format",
                "csv",
                "--typehints",
                "a=int63",
                "--out",
                str(tmp_path / "enc3"),
            ]
        )
    with pytest.raises(SystemExit, match="not in the CSV header"):
        main(
            [
                "encode",
                "--input",
                str(csv),
                "--input-format",
                "csv",
                "--typehints",
                "zz=int64",
                "--out",
                str(tmp_path / "enc4"),
            ]
        )


def test_split_real_parquet_into_target_sized_files(spark, tmp_path, capsys):
    """parquet-tool split analogue: one .parquet file fans out into
    multiple files near the raw-size target, content-invariant."""
    from parquet_go_spark.spark.pages_table import pages_df

    src_dir = str(tmp_path / "one")
    pages_df(spark, 4000, partitions=1).coalesce(1).write.parquet(src_dir)
    import glob

    src = glob.glob(f"{src_dir}/*.parquet")[0]
    rc = main(
        ["split", "--input", src, "--out", str(tmp_path / "split"), "--file-size-mb", "2"]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["files"] > 1
    import duckdb

    n, u = duckdb.sql(
        f"select count(*), count(distinct url) from read_parquet('{tmp_path}/split/*.parquet')"
    ).fetchone()
    assert n == 4000 and u == 4000


def test_cat_streams_every_row(spark, tmp_path, capsys):
    rc = main(
        [
            "cat",
            "--enc",
            "/root/testdata/sf0.001/documents.parquet",
            "--input-format",
            "parquet",
            "--columns",
            "doc_id,lang",
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 500
    assert {tuple(l) for l in lines} == {("doc_id", "lang")}


def test_head_and_decode_real_parquet(spark, tmp_path, capsys):
    rc = main(
        [
            "head",
            "--enc",
            "/root/testdata/sf0.001/documents.parquet",
            "--input-format",
            "parquet",
            "-n",
            "3",
            "--columns",
            "doc_id,lang",
        ]
    )
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [l["doc_id"] for l in lines] == [0, 1, 2]

    out = str(tmp_path / "reexport")
    rc = main(
        [
            "decode",
            "--enc",
            "/root/testdata/sf0.001/documents.parquet",
            "--input-format",
            "parquet",
            "--out",
            out,
        ]
    )
    assert rc == 0
    import duckdb

    n = duckdb.sql(f"select count(*) from read_parquet('{out}/*.parquet')").fetchone()[0]
    exp = duckdb.sql(
        "select count(*) from read_parquet('/root/testdata/sf0.001/documents.parquet')"
    ).fetchone()[0]
    assert n == exp
