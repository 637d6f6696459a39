"""Deployment smoke: the REAL `spark-submit --py-files` path.

North-rule deployment mode: package the engine as a zip, ship it via
--py-files, run the pipeline from an entry script with no repo on the
path. Runs as a subprocess against the actual spark-submit binary.
"""
import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)


def test_spark_submit_py_files_pipeline(spark, tmp_path):
    from bib_dedupe_spark.sources.synthetic import generate

    records, golden = generate(n_base=30, seed=9)
    inp = str(tmp_path / "records")
    out = str(tmp_path / "merged")
    spark.createDataFrame(pd.DataFrame(records)).write.parquet(inp)
    n_in = len(records)
    expect_merged = n_in - len(golden)  # each golden pair collapses once

    zip_path = str(tmp_path / "bib_dedupe_spark.zip")
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "package.py"), zip_path],
        check=True,
        capture_output=True,
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.driver.memory=4g",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zip_path,
            str(REPO / "scripts" / "submit_job.py"),
            "--input",
            inp,
            "--output",
            out,
            "--max-block-size",
            "1000",
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    merged = spark.read.parquet(out)
    assert merged.count() == expect_merged
    ids = {r["ID"] for r in merged.select("ID").collect()}
    for a, b in (tuple(sorted(p)) for p in golden):
        assert a in ids and b not in ids  # min-ID survived, partner merged
