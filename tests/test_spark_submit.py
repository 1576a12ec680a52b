"""End-to-end `spark-submit --py-files` launch test (north rule: "run
via spark-submit --py-files on a multi-executor cluster").

This is the honest version of that clause this sandbox can evidence:
the package is shipped ONLY as a zip via --py-files (the driver script
is a copy of cli.py in an otherwise-empty directory, so `from
emf_spark ...` can resolve nowhere else), the master comes ONLY from
`spark-submit --master` (cli._get_session must not override it), and
the job is the real pipeline over a real tokenized fixture, checked by
reading its parquet outputs back with an independent engine (duckdb).

Reference analog: the repo's own README run instructions
(fluent-bit-emf/README.md) launch the plugin inside fluent-bit with the
.so shipped alongside — the "deployable artifact + host runtime" seam
this test pins for the Spark world.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parents[1]


def _build_pyfiles_zip(dest: Path) -> Path:
    """zip -r emf_spark.zip emf_spark (sans caches), as the cli docstring
    instructs a cluster user to do."""
    zpath = dest / "emf_spark.zip"
    pkg = REPO / "emf_spark"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(pkg.rglob("*.py")):
            if "__pycache__" in p.parts:
                continue
            zf.write(p, p.relative_to(REPO))
    return zpath


def test_spark_submit_py_files_end_to_end(tmp_path):
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on PATH")

    # fixture input — written with pyarrow, no Spark in this process
    from emf_spark import fixtures

    inp = tmp_path / "tokenized.parquet"
    fixtures.write_corpus(str(inp), 1500, seed=11)

    zpath = _build_pyfiles_zip(tmp_path)
    # the driver script lives alone in tmp_path: spark-submit puts the
    # script's dir (NOT the repo) on sys.path, so the package import
    # succeeds only if --py-files actually ships and registers the zip
    script = tmp_path / "submit_main.py"
    shutil.copy(REPO / "emf_spark" / "cli.py", script)
    out = tmp_path / "out"

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # nothing may leak the repo onto the path
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=2g",
            "--py-files", str(zpath),
            str(script),
            "--input", str(inp),
            "--out", str(out),
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"

    # stdout's last JSON line is the run summary with per-sink stats
    summary = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert summary["out"] == str(out)
    assert summary["stats"], "pipeline reported no per-sink stats"
    events_out = sum(s["events_out"] for s in summary["stats"])
    assert events_out > 0

    # outputs verified by an INDEPENDENT reader (duckdb, not Spark)
    con = duckdb.connect()
    n_events = con.sql(
        f"SELECT count(*) FROM read_parquet('{out}/events/**/*.parquet', "
        "hive_partitioning=true)"
    ).fetchone()[0]
    assert n_events == events_out
    n_routed = con.sql(
        f"SELECT count(*) FROM read_parquet('{out}/routed/**/*.parquet', "
        "hive_partitioning=true)"
    ).fetchone()[0]
    assert n_routed > 0
