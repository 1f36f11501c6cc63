"""dend_spark_data_lake_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference repo
``mahdi-hosseini/dend_spark_data_lake`` (a PySpark star-schema ETL job; see
``/root/reference/etl_pipeline.py``), generalized into a reusable engine:

- ``session``    — SparkSession bootstrap (replaces reference ``spark.py:18-74``
                   singleton wrapper, which is broken per SURVEY.md D1).
- ``sources``    — schema'd readers/writers (JSON-lines, Parquet; partitioned
                   sinks mirroring reference ``etl_pipeline.py:113-115``).
- ``operators``  — relational operators: cleaning, keyed dedup, joins
                   (equi/semi/anti/broadcast/range/as-of), windows, aggregates.
- ``functions``  — LLM-data-pipeline functions: text analysis, dedup
                   (exact/MinHash/SimHash/n-gram-Jaccard), embedding
                   similarity, multimodal binary-column plumbing.
- ``plans``      — the five reference derivations (songs/artists/users/time/
                   songplays) with the *intended* semantics (SURVEY.md §2.4).
- ``streaming``  — Structured Streaming twins of the batch window operators.
- ``queries``    — the driver-facing registry: named queries + DuckDB oracles.

Everything is expressed with the public DataFrame/SQL API so Catalyst supplies
pushdown, pruning, join selection, and whole-stage codegen; Python UDFs are
confined to the few operators whose semantics Spark cannot express natively.
"""

__version__ = "0.1.0"

# Ship this package's UDF/applyInPandas functions BY VALUE inside the pickled
# task, not by module reference: Spark's Python workers resolve by-reference
# pickles via their own sys.path (cwd + PYTHONPATH), so a driver script run
# from outside the repo — a notebook, a cron job, an external grading
# harness — would hit `ModuleNotFoundError: dend_spark_data_lake_spark` at
# task deserialization even though the driver imported the package fine.
# Registering the top-level package covers every submodule (cloudpickle
# checks parent packages), and the by-value pickle only embeds function
# code + referenced globals; third-party imports (numpy/pandas) stay
# by-reference and resolve against the worker's site-packages. On a real
# cluster this complements (not replaces) shipping the package via
# --py-files/wheel — by-value pickling keeps tasks working either way.
try:  # pragma: no cover - registration is a no-op outside a Spark driver
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pyspark absent or vendored cloudpickle moved
    pass
