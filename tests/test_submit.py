"""End-to-end spark-submit deployment test: the cluster entry point must
build an index and answer a query with the package shipped ONLY via
--py-files (no repo dir on the path) — the exact north-rule run shape,
scaled to local[2]."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from apache___solr_spark.corpus import write_pages_parquet
from apache___solr_spark.session import build_pyfiles_zip


def test_spark_submit_pyfiles_build_and_query(tmp_path):
    zip_path = build_pyfiles_zip(str(tmp_path / "apache___solr_spark.zip"))
    pages = str(tmp_path / "pages.parquet")
    write_pages_parquet(pages, n_docs=300, seed=7)
    out = str(tmp_path / "index")
    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # scrub the repo from PYTHONPATH: the package must come from --py-files
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_index_build.py"),
            "--pages", pages,
            "--out", out,
            "--query", "web",
            "--k", "3",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),  # NOT the repo root — imports must use the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    metrics = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["event"] == "index_build_complete"
    assert metrics["n_docs"] == 300
    assert metrics["docs_per_sec"] > 0
    assert len(metrics["hits"]) == 3
    assert metrics["hits"][0]["rank"] == 1
