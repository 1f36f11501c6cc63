"""Time named queries through the noop sink (guide §1.4), n runs each.

    python tools/time_query.py dedup_ngram_jaccard dedup_corpus
    SPARK_GRAFT_TIME_RUNS=5 python tools/time_query.py sim_cosine_topk

Prints per-run seconds plus min/median. Uses the same session posture as
bench.py (local[$SPARK_GRAFT_CPUS], shuffle partitions = cpus) and drains
session caches between runs so persisted helpers never leak a warm read
into the next sample.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dend_spark_data_lake_spark.session import get_spark  # noqa: E402
from dend_spark_data_lake_spark.queries import (  # noqa: E402
    REGISTRY,
    release_session_caches,
)


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("SPARK_GRAFT_TIME_RUNS", "3"))
    spark = get_spark(
        app_name="time-query",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) if cpus.isdigit() else 32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py: JVM codegen + parquet reader + python workers
    spark.range(1000).selectExpr("sum(id)").collect()
    n = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    r = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    n.join(r, n.n_regionkey == r.r_regionkey).groupBy("r_name").count().collect()
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _warm_fn(s):
        return s * 1.0

    _warm = pandas_udf(_warm_fn, "double", functionType=200)  # SCALAR

    nc = int(cpus) if cpus.isdigit() else 32
    spark.range(0, nc * 10, 1, nc).select(_warm("id").alias("v")).selectExpr(
        "sum(v)"
    ).collect()

    for name in names:
        xs = []
        for _ in range(n_runs):
            release_session_caches()
            spark.catalog.clearCache()
            fn = REGISTRY[name].fn
            spark.sparkContext.setJobDescription(f"time:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            xs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        s = sorted(xs)
        med = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(
            f"{name}: runs={[round(x, 3) for x in xs]} min={min(xs):.3f} "
            f"median={med:.3f}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
