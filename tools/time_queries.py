"""Isolated per-query timing: fresh process, same methodology as bench.py
(warm at sf0.001, min-of-3 noop writes at the target SF), for a named subset.

Usage: python tools/time_queries.py <sf_dir> <query> [query ...]
Prints one line per query: name min median samples.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quill_agent_dashboard_pbi_etl_spark.operators.materialize import (
    release_dead_blocks,
)
from quill_agent_dashboard_pbi_etl_spark.plans import extensions  # noqa: F401
from quill_agent_dashboard_pbi_etl_spark.plans.registry import QUERIES
from quill_agent_dashboard_pbi_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(app_name="time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        spark.sparkContext.setJobDescription(f"warm {name}")
        try:
            QUERIES[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:
            pass
        release_dead_blocks(spark)
    for name in names:
        samples = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"timed {name} #{i}")
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.append(time.perf_counter() - t0)
            release_dead_blocks(spark)
        s = sorted(samples)
        print(
            f"TIMED {name} min={s[0]:.3f} med={s[1]:.3f} all="
            + ",".join(f"{x:.3f}" for x in samples),
            flush=True,
        )


if __name__ == "__main__":
    main()
