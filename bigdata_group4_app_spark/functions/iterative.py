"""Convergence plumbing for iterative DataFrame loops.

Every fixpoint loop in this engine (min-label propagation, alternating
star CC, k-core peeling, frontier BFS) follows the same round shape:
materialize the round's state with an eager ``localCheckpoint`` (lineage
truncation — CLAUDE.md iterative rule), then ask a scalar question about
that state ("how many rows changed?", "is the edge set identical to last
round's?") to decide whether to stop.  Asking with a separate ``count()``
(or worse, ``exceptAll``) costs one extra Spark JOB per round — and at
the toy SFs the driver benches, these loops are bounded by the ~0.15-0.3
s/job scheduling floor, not by data, so the convergence-check job is a
measurable fraction of every iterative query's wall (guide §1.2 step 1:
don't compute things you throw away; VERDICT r13 next-round item 3).

``checkpoint_with_metrics`` folds the question INTO the materialization:
``DataFrame.observe`` attaches aggregate metrics that Spark computes on
the rows flowing through the checkpoint's own action, so a round costs
exactly ONE job and the convergence scalars ride along for free.  The
metrics are exact aggregates over the full checkpointed row set (the
CollectMetrics node sits above the full plan), not estimates — the loop
semantics and round counts are bit-identical to the count()-based form.

Plan-capture compatibility: ``scripts/capture_plan_r*.py`` monkey-patch
``localCheckpoint`` to identity so iterative queries expose their whole
per-round lineage in one plan.  Under that patch no action fires and
``Observation.get`` would block forever — so the helper detects the
patch (a REAL checkpoint's analyzed plan is a ``LogicalRDD``; the
identity-patched one still shows ``CollectMetrics``) and falls back to
one explicit count-shaped action, restoring the old per-round cost only
in capture mode.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def checkpoint_with_metrics(
    df: DataFrame, *metrics: Column
) -> tuple[DataFrame, dict]:
    """Eagerly ``localCheckpoint`` ``df`` and return the checkpointed
    frame plus the observed aggregate ``metrics``, computed during the
    checkpoint's own materialization job (zero extra jobs per round).

    ``metrics`` are aggregate expressions over ``df``'s columns (e.g.
    ``F.count(F.lit(1))``, ``F.sum(...)``) — the same contract as
    ``DataFrame.observe``.
    """
    obs = Observation()
    out = df.observe(obs, *metrics).localCheckpoint()
    # A real eager localCheckpoint already ran the materialization action
    # (analyzed plan = LogicalRDD over the checkpointed partitions).  If a
    # plan-capture script patched localCheckpoint to identity, the plan
    # still carries the un-executed CollectMetrics node — fire one
    # explicit action so Observation.get cannot block forever.
    analyzed = out._jdf.queryExecution().analyzed()  # type: ignore[attr-defined]
    if analyzed.getClass().getSimpleName() != "LogicalRDD":
        out.count()  # capture-mode fallback only (identity checkpoint)
    return out, obs.get
