"""North-rule deployment shape: the pipeline must run via
``spark-submit --py-files <package.zip>``.

The script is COPIED outside the repo and run with a non-repo cwd, so
``entitysummarization_spark`` can only resolve from the shipped zip —
exactly how a cluster executor/driver sees it. Asserts the run writes the
materialized outputs (summaries, lineage, checkpoints).
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_py_files_deployment(tmp_path):
    pkg_zip = tmp_path / "esum_spark.zip"
    pkg_root = os.path.join(REPO, "entitysummarization_spark")
    with zipfile.ZipFile(pkg_zip, "w") as zf:
        for root, dirs, files in os.walk(pkg_root):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                # ship everything except bytecode — package data (resource
                # files, py.typed) must reach the cluster too, so the zip
                # mirrors the real package, not just *.py
                if not f.endswith((".pyc", ".pyo")):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    shipped = {n for n in zipfile.ZipFile(pkg_zip).namelist()}
    on_disk = {
        os.path.relpath(os.path.join(r, f), REPO)
        for r, ds, fs in os.walk(pkg_root)
        if "__pycache__" not in r
        for f in fs
        if not f.endswith((".pyc", ".pyo"))
    }
    assert shipped == on_disk

    script_dir = tmp_path / "scripts"
    script_dir.mkdir()
    shutil.copy(os.path.join(REPO, "scripts", "run_pipeline.py"),
                script_dir / "run_pipeline.py")

    out_dir = tmp_path / "kg_out"
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--py-files", str(pkg_zip),
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         str(script_dir / "run_pipeline.py"),
         "--fixture", "40", "--output", str(out_dir),
         "--sweeps", "2", "--partitions", "2", "--checkpoint-every", "1"],
        capture_output=True, text=True, timeout=480, cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert (out_dir / "summaries").exists()
    assert (out_dir / "lineage").exists()
    assert (out_dir / "checkpoints").exists()
    # the driver really imported from the zip, not the repo
    assert "Traceback" not in proc.stderr
