"""Capture .explain("formatted") for every registry query into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [suffix] [names...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix default "before").
Note: these are the pre-execution plans (AdaptiveSparkPlan initial) — the
same artifact the optimization deliverable asks for; executed-plan audits go
through tools/plan_audit.py instead.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quill_agent_dashboard_pbi_etl_spark.plans import extensions  # noqa: F401
from quill_agent_dashboard_pbi_etl_spark.plans.registry import QUERIES
from quill_agent_dashboard_pbi_etl_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or list(QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print(f"ok   {name}", flush=True)
        except Exception as exc:  # noqa: BLE001 — record and continue
            with open(path, "w") as fh:
                fh.write(f"ERROR: {type(exc).__name__}: {exc}\n")
            print(f"ERR  {name}: {exc}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
