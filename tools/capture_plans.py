"""Dump ``explain('formatted')`` for named queries to plans/<tag>/<name>_<suffix>.txt.

    python tools/capture_plans.py r14 before ref_star_join dedup_corpus ...
    python tools/capture_plans.py r14 before --headline   # the frozen bench list
    python tools/capture_plans.py r14 before --all        # every registry entry

Driver-only work (plans are built, not executed), so it is cheap to run even
while other Spark jobs own the cores.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dend_spark_data_lake_spark.session import get_spark  # noqa: E402
from dend_spark_data_lake_spark.queries import (  # noqa: E402
    REGISTRY,
    release_session_caches,
)


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if names == ["--headline"]:
        import bench

        names = list(bench.HEADLINE)
    elif names == ["--all"]:
        names = list(REGISTRY)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({txt.count('Exchange')} Exchange markers)")
        release_session_caches()
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
