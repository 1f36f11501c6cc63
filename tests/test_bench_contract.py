"""Contract smoke for bench.py — the driver parses its LAST stdout line
as JSON and records it as BENCH_r{N}.json; a formatting regression here
loses the round's performance artifact (it happened to round 3 via line
truncation — this guards the producer side).

Runs the real CLI once at the smallest scale with 1 rep; asserts the
two-line protocol (detail first, short parseable final line), exit 0,
and the final line's required keys incl. the min-of-n primary value
(VERDICT r7 ask #4)."""

from __future__ import annotations

import pytest

import json
import os
import subprocess
import sys


@pytest.mark.nightly  # heavyweight replay: default tier must fit the driver's verify budget (r15)
def test_bench_cli_two_line_protocol():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_SF1="0",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        check=True,
    )
    lines = [l for l in out.stdout.splitlines() if l.strip().startswith("{")]
    assert len(lines) == 2, out.stdout[-2000:]
    detail = json.loads(lines[0])
    final = json.loads(lines[1])
    assert detail["detail"] == "bench_full"
    assert set(detail) >= {
        "runs_per_query", "queries_min", "secondary_queries",
        "secondary_total", "sf1_dataproof",
    }
    # the driver's tail capture must always get the short final line:
    # primary value = min-of-n, median alongside, per-query medians
    assert set(final) >= {
        "metric", "value", "unit", "queries", "sf", "total_min",
        "total_median",
    }
    assert final["metric"] == "headline_queries_total_wall_min"
    assert final["value"] == final["total_min"] > 0
    assert final["total_median"] >= final["total_min"]
    assert len(final["queries"]) == 36  # frozen headline list
    assert len(lines[1]) < 4000, "final line must stay truncation-proof"
