"""Session-global Ray Data executor tuning for actor-pool stages.

Two defaults in Ray 2.49 idle actor-pool stages on a busy node (both
measured on the extraction DAG, BASELINE.md "Round-4 addendum"):

1. The pool-upscaling threshold is 2.0 — a pool only grows once the
   submitted-task backlog reaches 2× its capacity, one actor per
   decision, and no decision fires while an actor is still starting.
2. The reservation allocator splits the non-reserved CPU budget
   EQUALLY across eligible operators each tick, so in a ~8-operator
   DAG one hot pool is never granted more than ~min + shared/8 CPUs
   (a 32-CPU pool plateaued at 13 of 27 actors with the node idle).

`tune_pool_autoscaler()` sets the threshold to 1.0 (grow as soon as
the pool is saturated) and doubles the executor's CPU *budget* — Ray
Core still places tasks by the node's physical logical-CPU count, so
cores are never oversubscribed beyond the per-task num_cpus math; the
extra budget only stops the equal split from idling the node. Called
by every pipeline that builds an actor pool; idempotent; env
overrides: READUR_POOL_UPSCALE_THRESHOLD, READUR_CPU_BUDGET_FACTOR
(set 1.0 to restore stock behavior).
"""

from __future__ import annotations

import os


def tune_pool_autoscaler() -> None:
    import ray
    from ray.data import DataContext
    from ray.data.context import AutoscalingConfig

    thr = float(os.environ.get("READUR_POOL_UPSCALE_THRESHOLD", "1.0"))
    ctx = DataContext.get_current()
    if ctx.autoscaling_config.actor_pool_util_upscaling_threshold != thr:
        ctx.autoscaling_config = AutoscalingConfig(
            actor_pool_util_upscaling_threshold=thr,
        )

    factor = float(os.environ.get("READUR_CPU_BUDGET_FACTOR", "2.0"))
    if factor != 1.0 and ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", 0))
        if ncpu:
            limits = ctx.execution_options.resource_limits
            target = ncpu * factor
            if limits.cpu != target:
                ctx.execution_options.resource_limits = limits.copy(
                    cpu=target
                )
