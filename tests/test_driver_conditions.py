"""Regression lock for external-harness conditions.

The grading driver imports ``__spark_entry__`` with its own SparkSession and
an arbitrary working directory. Spark's Python workers resolve by-reference
pickles against THEIR sys.path (worker cwd + PYTHONPATH), not the driver's,
so a module-level function shipped inside a UDF pickle used to raise
``ModuleNotFoundError: dend_spark_data_lake_spark`` at task deserialization
whenever the harness ran from outside the repo. ``__init__`` now registers
the package for by-value cloudpickle serialization; this test reproduces the
harness condition in a subprocess (neutral cwd, PYTHONPATH scrubbed, plain
SparkSession) and drives the query that exposed the failure.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import importlib.util, sys
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", {entry!r})
mod = importlib.util.module_from_spec(spec)
sys.path.insert(0, {repo!r})
spec.loader.exec_module(mod)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
q = mod.queries()
# the UDF-bearing query that fails if worker pickles are not self-contained
n = q["multimodal_features"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("WORKER_PICKLE_OK", n)
"""


def test_udf_queries_run_with_foreign_cwd_and_no_pythonpath(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(entry=f"{REPO}/__spark_entry__.py", repo=REPO)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "WORKER_PICKLE_OK" in out.stdout, out.stdout
