"""Stage-level profile of registry queries (guide §1/§7: empirical first).

For each named query: warm once, then run the noop-sink write N times labeled
via setJobDescription, and attribute per-stage wall/executorRunTime/task
counts through the UI REST API. Prints, per query, the measured runs and the
per-stage breakdown of the FINAL run — the evidence for "where does the time
go" (single-task stages, shuffle-heavy stages, scheduling overhead).

Usage: python tools/probe_query_profile.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROFILE_RUNS (3).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quill_agent_dashboard_pbi_etl_spark.plans import extensions  # noqa: F401
from quill_agent_dashboard_pbi_etl_spark.plans.registry import QUERIES
from quill_agent_dashboard_pbi_etl_spark.session import get_spark


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROFILE_RUNS", "3"))
    spark = get_spark(
        app_name="probe-query-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = _get(f"{ui}/api/v1/applications")[0]["id"]

    # Warm shapes (janino compile) at sf0.001 once per query.
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            QUERIES[name](spark, warm_dir).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception:
            pass
    spark.catalog.clearCache()

    for name in names:
        fn = QUERIES[name]
        walls = []
        for i in range(runs):
            desc = f"profile:{name}:{i}"
            spark.sparkContext.setJobDescription(desc)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
        print(f"\n=== {name}: walls {[round(w, 3) for w in walls]} (min "
              f"{min(walls):.3f})")
        # Attribute the LAST run's jobs/stages.
        desc = f"profile:{name}:{runs - 1}"
        jobs = [
            j
            for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded")
            if j.get("description") == desc
        ]
        stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
        print(f"  jobs={len(jobs)} stages={len(stage_ids)}")
        stages = {
            s["stageId"]: s
            for s in _get(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
        }
        for sid in stage_ids:
            s = stages.get(sid)
            if s is None:
                continue
            wall = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                try:
                    t1 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                    t2 = datetime.strptime(s["completionTime"], fmt)
                    wall = (t2 - t1).total_seconds()
                except ValueError:
                    pass
            print(
                f"  stage {sid:>4} tasks={s['numCompleteTasks']:>3} "
                f"wall={wall if wall is not None else '?':>6} "
                f"runTime={s['executorRunTime'] / 1000:7.3f}s "
                f"cpu={s.get('executorCpuTime', 0) / 1e9:7.3f}s "
                f"shufW={s.get('shuffleWriteBytes', 0):>9} "
                f"in={s.get('inputBytes', 0):>9} | {s['name'].split(chr(10))[0][:70]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
