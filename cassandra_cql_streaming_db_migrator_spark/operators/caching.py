"""Lifecycle-safe multi-consumer materialization.

``persist()`` on a DataFrame registers it in Spark's CacheManager, which
holds a strong reference until an explicit ``unpersist()`` — and a lazy
operator library has no good place to put that call: the operator returns
an unexecuted plan, so "after the dependent action" is the *caller's*
timeline, and callers (the round driver, bench loops, user sessions) never
see the intermediate.  Round 5 shipped 24 ``persist()`` sites against zero
``unpersist()`` calls; a session chaining several distributed-selection
queries held multiple full-table MEMORY_AND_DISK copies until LRU eviction
(VERDICT r05 "What's wrong" #1).

:func:`materialized` is the replacement discipline.  It is backed by
``DataFrame.localCheckpoint(eager=False)``:

* **Same runtime sharing as persist.** ``localCheckpoint`` persists the
  underlying RDD (MEMORY_AND_DISK) before truncating lineage, so a frame
  feeding two plan branches — or two separate actions, like the
  distributed-rank offsets collect followed by the ranked output — is
  computed once and the blocks are shared, exactly as with ``persist()``.
* **Automatic release.** Checkpoint blocks are NOT registered in the
  CacheManager.  They are owned by the RDD, and Spark's ContextCleaner
  frees them as soon as the RDD becomes unreachable — i.e. when the query's
  final DataFrame is dropped by the caller.  Nothing outlives its query;
  a chain of three ``distributed_ntile`` calls holds at most the frames the
  final plan still references (each checkpoint truncates lineage, so
  earlier intermediates become collectable mid-chain).  The resident-cache
  lifecycle test (tests/test_windows.py) pins this.
* **Eager.** The checkpoint job runs at operator-build time.  Round 12
  reversed the original ``eager=False`` choice: lazy checkpoints feeding
  both sides of a self-join were computed TWICE by AQE's concurrent
  join-side map stages (no synchronization on first materialization), so
  the barrier did not barrier — see :func:`materialized`'s docstring.
  Bench timings are unaffected either way (the bench times plan build +
  execution together).

Trade-off, documented: a localCheckpoint truncates lineage, so losing an
executor loses blocks *without a recompute path* — the job fails and must
be retried from the source (Spark's own guidance for this API).  At 100 TB
on a lossy cluster, swap ``localCheckpoint`` for a reliable
``checkpoint()`` into the job's scratch dir — same call shape, durable
blocks — or accept query-level retry.  The alternative (persist + caller-
visible release handles on every operator) taxes every API for a lifecycle
only long sessions notice; SCALE_NOTES.md carries the decision record.

Audit mode: ``SPARK_GRAFT_NO_MATERIALIZE=1`` makes :func:`materialized`
the identity.  A checkpointed frame explains as ``Scan ExistingRDD`` —
upstream exchanges, scans and kernels vanish from the plan text — so
tools/plan_audit.py sets the flag to audit the FULL lineage (each consumer
branch re-prints its upstream; the per-query shuffle allowances count that
textual duplication, as the rfm_segments allowance always has).  Identity
mode is for plan inspection only — never for executing queries, since
multi-action operators (distributed_rank's pid collect) rely on the
materialization barrier for cross-action determinism.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["materialized"]


def materialized(df: DataFrame) -> DataFrame:
    """Materialization barrier for a frame consumed by multiple plan
    branches or multiple actions: computed once, blocks released by the
    ContextCleaner when the result becomes unreachable (no CacheManager
    pin, no explicit unpersist needed).  See module docstring.

    EAGER (optimization r12): ``eager=False`` did not actually barrier —
    when the checkpointed frame feeds BOTH sides of a self-join (the
    minhash/simhash bucket joins), AQE schedules the two join-side shuffle
    map stages as concurrent jobs, each finds the checkpoint RDD
    unmaterialized, and each computes the full upstream pipeline: the
    "computed once" contract silently became computed twice, in parallel
    (measured: the LSH pair join dropped ~40% wall on eager).  Eager runs
    the materialization job at operator-build time instead; every consumer
    (bench, driver sweep, oracle gate) executes what it builds, and the
    plan-audit path still gets the full lineage via
    ``SPARK_GRAFT_NO_MATERIALIZE``."""
    if os.environ.get("SPARK_GRAFT_NO_MATERIALIZE"):
        return df
    # measurement knob (tools/ab_compare.py): the r12 eager flip fixed the
    # self-join double compute but serializes a driver-paced job per
    # barrier; the lazy variant stays A/B-able so regressions can be
    # attributed (OPTIMIZATION_r13.md).  Production default stays eager.
    if os.environ.get("SPARK_GRAFT_MATERIALIZE_LAZY"):
        return df.localCheckpoint(eager=False)
    return df.localCheckpoint(eager=True)
