"""Small shared runtime helpers."""

from __future__ import annotations

_configured = False


def configure_context() -> None:
    """Engine-wide DataContext tuning, applied once per process.

    Push-based sort shuffle: measurably better reduce-side parallelism for
    the groupby/sort exchanges on wide clusters (window-triples stage:
    1.6x 8->32-CPU scaling vs 1.2x with the pull-based default, and ~15%
    faster absolute at 32 CPUs).  Called from the pipeline/query entry
    modules; safe to call repeatedly.
    """
    global _configured
    if _configured:
        return
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    DataContext.get_current().shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    _configured = True


def pool_size(min_actors: int = 1) -> tuple[int, int]:
    """Default actor-pool ``concurrency`` for stateful ``map_batches`` stages:
    autoscale from ``min_actors`` up to the cluster's CPU count.

    A hardcoded cap (the old ``(1, 8)``) silently throttles every actor-pool
    stage on clusters wider than the cap — the scaling-efficiency killer when
    the same job runs at N and 4N CPUs.  Reading the cluster size at plan
    time keeps the pool proportional to the cluster.
    """
    import ray

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    else:  # planning before ray.init (tests, doc examples): modest default
        cpus = 8
    # min = cpus/4: the autoscaling pool ramps too slowly for short stages if
    # it starts at 1 actor, but reserving the whole cluster as minimum would
    # starve concurrent pools in a fused pipeline.
    return (max(min_actors, cpus // 4), max(8, cpus))


def heavy_pool_size() -> tuple[int, int]:
    """Pool sizing for the single heaviest stage of a pipeline (the flagship
    tagger): min = half the cluster so the pool is already wide when work
    arrives — the autoscaler's ramp otherwise eats most of the stage on
    medium inputs.  Capped at 1/2 (not more) so a pipeline composing TWO
    such pools (e.g. gold tagging -> re-tagging for evaluation) cannot
    live-lock: pools claim their minimum actors eagerly, and minimums that
    sum to the whole cluster starve the upstream read tasks (measured hang
    at 3/4 + 1/4)."""
    import ray

    if ray.is_initialized():
        cpus = int(ray.cluster_resources().get("CPU", 8))
    else:
        cpus = 8
    return (max(2, cpus // 2), max(8, cpus))
