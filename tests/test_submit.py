"""north_rule clause: "run via spark-submit --py-files".

Evidence that the packaged zip alone ships the engine: a fresh
spark-submit driver, launched from a neutral cwd with no PYTHONPATH and no
repo checkout on sys.path, imports auth2wd_spark from the --py-files zip
and runs the full KG pipeline end-to-end.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER_SCRIPT = """
import sys
# the engine must come from the --py-files zip, not a repo checkout
assert not any(p.rstrip("/") == {repo!r} for p in sys.path), sys.path
from pyspark.sql import SparkSession

spark = SparkSession.builder.getOrCreate()
from auth2wd_spark import schemas
from auth2wd_spark.corpus.generate import build_corpus
from auth2wd_spark.plans.pipeline import PipelineConfig, run_pipeline

corpus = build_corpus(n_persons=20, fixtures_dir=None)
pages = spark.createDataFrame(corpus["pages"], schemas.PAGES)
id_to_qid = spark.createDataFrame(corpus["id_to_qid"], schemas.ID_TO_QID)
viaf = spark.createDataFrame(corpus["viaf_lookup"], schemas.VIAF_LOOKUP)
gnd = spark.createDataFrame(corpus["valid_gnd_ids"], schemas.VALID_GND_IDS)
tables = run_pipeline(pages, id_to_qid, viaf, gnd, PipelineConfig())
n_triples = tables["triples"].count()
n_claims = tables["claims"].count()
assert n_triples > 0 and n_claims > 0
spark.stop()
print(f"SUBMIT_OK triples={{n_triples}} claims={{n_claims}}")
"""


def _spark_submit_bin() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles(tmp_path):
    submit = _spark_submit_bin()
    if not os.path.isfile(submit):
        pytest.skip(f"spark-submit not found at {submit}")
    from auth2wd_spark.session import package_zip_path

    zip_path = package_zip_path()
    script = tmp_path / "driver.py"
    script.write_text(_DRIVER_SCRIPT.format(repo=REPO))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            str(script),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "SUBMIT_OK" in proc.stdout, (
        f"spark-submit pipeline failed (rc={proc.returncode}):\n"
        f"stdout tail: {proc.stdout[-1000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
