"""The north rule's deployment shape, exercised for real: package the
engine as ``linkgraph.zip`` and run the flagship pipeline through
``spark-submit --py-files`` in a fresh JVM from a NEUTRAL cwd — the
package can only be importable via the zip. The submitted run must
byte-match an in-process run of the same job (generation is
hash-derived, PageRank here is the fixed-iteration variant, and the
summary rounds away float summation order)."""

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PAGES = 300


def _spark_submit() -> str:
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return cand if os.path.exists(cand) else "spark-submit"


def test_package_zip_is_deterministic_and_complete(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package_zip import build_zip

    z1 = build_zip(str(tmp_path / "a.zip"))
    z2 = build_zip(str(tmp_path / "b.zip"))
    assert open(z1, "rb").read() == open(z2, "rb").read()
    names = set(zipfile.ZipFile(z1).namelist())
    # every package module ships, nothing else does
    assert "linkgraph/__init__.py" in names
    assert "linkgraph/operators/pagerank.py" in names
    assert all(n.startswith("linkgraph/") and n.endswith(".py") for n in names)


@pytest.mark.slow
def test_spark_submit_py_files_matches_in_process(tmp_path, spark):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from package_zip import build_zip
    from submit_job import run

    zip_path = build_zip(str(tmp_path / "linkgraph.zip"))
    out_json = tmp_path / "out.json"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import path
    proc = subprocess.run(
        [
            _spark_submit(),
            "--master", "local[4]",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_job.py"),
            str(out_json), str(N_PAGES),
        ],
        cwd=str(tmp_path),  # neutral cwd: no repo-root fallback import
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    submitted = json.loads(out_json.read_text())
    assert submitted == run(spark, N_PAGES)
