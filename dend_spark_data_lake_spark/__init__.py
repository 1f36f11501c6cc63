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
