"""The north-star launch mode: ``spark-submit --py-files pgs.zip`` with a
driver script that only imports the engine from the shipped zip. Proves
the package is self-contained (no repo-path imports inside executors)
and the encode job runs under a cold spark-submit JVM end-to-end."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

pytestmark = pytest.mark.spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

DRIVER = """
import json, sys
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
# imports resolve from the --py-files zip shipped to driver and executors
from parquet_go_spark.spark.pages_table import pages_df
from parquet_go_spark.spark.encode_job import encode_table
from parquet_go_spark.spark.decode_job import decode_table
from parquet_go_spark.spark.verify import verify_roundtrip

out = sys.argv[1]
df = pages_df(spark, 2000, partitions=2)
man = encode_table(df, out, key_col="url", partitions=4, compression="snappy").collect()
ok = verify_roundtrip(df, decode_table(spark, out), key="url")["ok"]
print("RESULT " + json.dumps({
    "ok": bool(ok),
    "rows": sum(r["num_rows"] for r in man if r["column"] == "url"),
    "encodings": sorted({r["encoding"] for r in man if r["num_rows"] > 0}),
}))
"""


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed")
def test_spark_submit_py_files_roundtrip(tmp_path):
    zip_path = str(tmp_path / "parquet_go_spark.zip")
    pkg = os.path.join(REPO, "parquet_go_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    out_dir = str(tmp_path / "enc")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files only
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    res = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[2]",
            "--py-files",
            zip_path,
            "--conf",
            "spark.sql.shuffle.partitions=4",
            str(driver),
            out_dir,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # not the repo: no accidental repo-dir imports
    )
    line = [l for l in res.stdout.splitlines() if l.startswith("RESULT ")]
    assert line, f"no RESULT line.\nstdout:\n{res.stdout[-2000:]}\nstderr:\n{res.stderr[-2000:]}"
    payload = json.loads(line[-1].removeprefix("RESULT "))
    assert payload["ok"] is True
    assert payload["rows"] == 2000
    assert payload["encodings"], payload
