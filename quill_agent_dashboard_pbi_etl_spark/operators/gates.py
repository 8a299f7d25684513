"""Roster allow-list gate (SURVEY.md §2.4 D4).

Reference: build Set(agentId) from the live ring-group roster and keep events
whose agentId is a member; on roster-fetch failure pass everything through
(fail-open) — src/workflows/ingest/orchestrator.ts:45-69.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def roster_gate(
    events: DataFrame,
    roster: DataFrame | None,
    agent_col: str = "AgentID",
    roster_agent_col: str = "AgentID",
    fail_open: bool = True,
) -> DataFrame:
    """Semi-join events against the roster allow-list.

    ``roster=None`` models the fetch-failure path: fail-open passes all events
    (orchestrator.ts:59-61), fail-closed drops all. The roster is one ring
    group (tiny) → explicit ``broadcast`` so the gate never shuffles the fact
    side.
    """
    if roster is None:
        if fail_open:
            return events
        return events.filter(F.lit(False))
    allow = roster.select(F.col(roster_agent_col).alias(agent_col)).distinct()
    return events.join(broadcast(allow), on=agent_col, how="left_semi")
