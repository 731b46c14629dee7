"""Scoped Ray Data executor tuning for actor-pool pipelines.

Two defaults in Ray 2.49 idle actor-pool stages on a busy node (both
measured on the extraction DAG, BASELINE.md "Round-4 addendum"):

1. The pool-upscaling threshold is 2.0 — a pool only grows once the
   submitted-task backlog reaches 2× its capacity, one actor per
   decision, and no decision fires while an actor is still starting.
2. The reservation allocator splits the non-reserved CPU budget
   EQUALLY across eligible operators each tick, so in a ~8-operator
   DAG one hot pool is never granted more than ~min + shared/8 CPUs
   (a 32-CPU pool plateaued at 13 of 27 actors with the node idle).

`tuned_executor()` sets the threshold to 1.0 and doubles the
executor's CPU *budget* — Ray Core still places tasks by the node's
physical logical-CPU count, so cores are never oversubscribed beyond
the per-task num_cpus math.

It is a CONTEXT MANAGER, not a global switch, because every
`ray.data.read_*` captures a COPY of the ambient DataContext: build
the actor-pool DAG inside the `with` block and only those datasets
execute with the tuned budget. Leaving the tuning session-global was
measured to THRASH unrelated shuffle-heavy queries that ran later in
the same session (the 2× budget admits 2× concurrent shuffle tasks:
semdedup 8 s → 46 s, pack_sequences 1.8 s → 8 s in one sweep).

Env overrides: READUR_POOL_UPSCALE_THRESHOLD,
READUR_CPU_BUDGET_FACTOR (set 1.0 to keep the stock budget).
"""

from __future__ import annotations

import os
from contextlib import contextmanager


@contextmanager
def tuned_executor():
    import ray
    from ray.data import DataContext
    from ray.data.context import AutoscalingConfig

    ctx = DataContext.get_current()
    prev_autoscaling = ctx.autoscaling_config
    prev_limits = ctx.execution_options.resource_limits
    prev_shuffle = ctx.shuffle_strategy
    prev_hash_cpus = ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
    try:
        thr = float(os.environ.get("READUR_POOL_UPSCALE_THRESHOLD", "1.0"))
        ctx.autoscaling_config = AutoscalingConfig(
            actor_pool_util_upscaling_threshold=thr,
        )
        # the skew branch's doc_id co-location runs as a keyed HASH
        # shuffle (extract._assemble) — sort-based groupby would plant
        # a logical Sort and flip the whole DAG to preserve_order,
        # under which the final union buffers its entire input (the
        # 20M-doc stall, BASELINE.md round-5). Aggregator actors get a
        # token CPU claim: the reassembly stream is a fixed small
        # fraction of the corpus, and the default sizing (up to 50% of
        # the cluster) would starve the extraction pools.
        from ray.data.context import ShuffleStrategy

        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
        factor = float(os.environ.get("READUR_CPU_BUDGET_FACTOR", "2.0"))
        if factor != 1.0 and ray.is_initialized():
            ncpu = int(ray.cluster_resources().get("CPU", 0))
            if ncpu:
                ctx.execution_options.resource_limits = prev_limits.copy(
                    cpu=ncpu * factor
                )
        yield ctx
    finally:
        ctx.autoscaling_config = prev_autoscaling
        ctx.execution_options.resource_limits = prev_limits
        ctx.shuffle_strategy = prev_shuffle
        ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = (
            prev_hash_cpus
        )
