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
* **Lazy.** The checkpoint materializes at the consumer's first action,
  not at operator-build time.  Round 12 flipped this to eager on a
  wall-clock A/B that attributed a double compute to AQE's concurrent
  join-side stages; round 13's task-level re-measurement showed the
  double compute does not exist on Spark 4.1 (block-level write locks
  share the first materialization) while the eager build-time job
  serializes the driver — see :func:`materialized`'s docstring for the
  numbers.  Bench timings see both (the bench times plan build +
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


def materialized(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialization barrier for a frame consumed by multiple plan
    branches or multiple actions: computed once, blocks released by the
    ContextCleaner when the result becomes unreachable (no CacheManager
    pin, no explicit unpersist needed).  See module docstring.

    LAZY (optimization r13, reversing the r12 eager flip with task-level
    evidence): round 12 flipped to ``eager=True`` on a wall-clock A/B,
    attributing the win to AQE's concurrent join-side stages each
    recomputing an unmaterialized lazy checkpoint.  Round 13 re-measured
    at the TASK level (event-log task-runtime totals, minhash_pairs:
    eager 7.26 s vs lazy 7.59 s of summed task runtime, same stage
    structure, the signature kernel executing ONCE in both) — on Spark
    4.1 the block manager's per-block write locks make the concurrent
    stages share the first materialization, so lazy does NOT double
    compute.  What eager does do is serialize one driver-paced job per
    barrier at operator-BUILD time; interleaved counterbalanced A/Bs
    (tools/ab_compare.py, committed in OPTIMIZATION_r13.md) measured the
    lazy variant at 0.70-0.76x median wall on every CC-loop consumer
    (curation_funnel, source_dup_report, dedup_components_star,
    dedup_canonical, fuzzy_dedup, minhash_pairs) and parity elsewhere —
    the exact regression set VERDICT r12 flagged.  The barrier contract
    (computed once, shared blocks, ContextCleaner release) is identical;
    only WHEN the materialization job runs moves.
    ``SPARK_GRAFT_MATERIALIZE_EAGER=1`` keeps the r12 behaviour A/B-able.

    ``eager=True`` opts a single site back into build-time materialization
    — the overlap primitive (guide §2.6): a caller that runs an
    independent pipeline leg on a worker thread passes eager=True so the
    leg EXECUTES there, back-filling the driver gaps of the main thread's
    loop, instead of deferring itself into the main thread's final
    action."""
    if os.environ.get("SPARK_GRAFT_NO_MATERIALIZE"):
        return df
    if eager or os.environ.get("SPARK_GRAFT_MATERIALIZE_EAGER"):
        return df.localCheckpoint(eager=True)
    return df.localCheckpoint(eager=False)
