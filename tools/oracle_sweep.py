"""Full-registry oracle sweep: run EVERY registered query against its
DuckDB oracle at a given scale factor and report per-query status — the
local replica of the driver's correctness gate, at any SF.

    python tools/oracle_sweep.py /root/testdata/sf0.01
    python tools/oracle_sweep.py /root/testdata/sf0.1      # ~10 min

Prints FAIL/ERR lines as they happen and one DONE summary line. Exit code
0 iff no failures. Used for the per-round end-state certification sweeps
(COVERAGE.md records the results); sf0.01 is the driver's grading scale,
sf0.1 the bench scale where rounding/overflow seams surface that smaller
SFs cannot.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_utils import duckdb_connection, compare  # noqa: E402
from dend_spark_data_lake_spark.session import get_spark  # noqa: E402
from dend_spark_data_lake_spark.queries import (  # noqa: E402
    REGISTRY,
    release_session_caches,
)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional query-name filter for dev loops
    unknown = only - set(REGISTRY)
    assert not unknown, f"unknown query names: {sorted(unknown)}"
    spark = get_spark(app_name="oracle-sweep")
    con = duckdb_connection(sf)
    fails, n_ok, n_rows_only = [], 0, 0
    t0 = time.time()
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            if spec.oracle is None:
                assert spec.fn(spark, sf).count() >= 0
                n_rows_only += 1
                continue
            problems = compare(spec.fn(spark, sf), con, spec.oracle)
            if problems:
                fails.append(name)
                print(f"FAIL {name}: {problems}", flush=True)
            else:
                n_ok += 1
        except Exception as e:  # noqa: BLE001 - report and continue the sweep
            fails.append(name)
            print(f"ERR {name}: {str(e)[:200]}", flush=True)
        finally:
            # helpers that persist() for determinism (pid-window machinery,
            # pq_train_quantized) cannot unpersist their own lazy output;
            # without this a 347-query session accumulates every cached
            # relation until session end (ADVICE r8). The registry drain
            # keeps the tracked-cache list itself from growing across the
            # sweep (ADVICE r12) — clearCache alone leaves the Python refs.
            release_session_caches()
            spark.catalog.clearCache()
    print(
        f"DONE sf={sf} ok={n_ok} rows_only={n_rows_only} "
        f"fails={len(fails)} in {time.time() - t0:.0f}s"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
