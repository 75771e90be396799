"""Driver-side collect guard (VERDICT r10 ask #5 / weak #2).

Several serve-path operators ship a small frame to every task as a dense
matrix — the "broadcast contract": query vectors (knn_join, batched ANN),
anchor sets (contrastive_topk), bench suites (decontaminate).  The contract
was documented at every site but nothing ENFORCED it; an input that grows
with the corpus (contrastive_triplets' ``vec_id % 50`` anchors) would
silently OOM the driver at scale instead of failing with a actionable
error.  :func:`collect_bounded` is that enforcement: a typed error past a
declared bound, raised from a ``limit(bound + 1)`` probe so the oversize
frame is never materialized driver-side.

Reference analog: the reference bounds every driver-side buffer the same
way — its page fetch is capped by the spec's batch size
(DataMigrationProcess.java:227-269's validated limits) rather than trusting
the source to be small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row

#: Default per-operator bound for broadcast-contract collects.  Sized for
#: rows carrying a dim<=64 float vector (~0.5 KB driver-side as a Row):
#: 100k rows ~ 50 MB on the driver and ~50 MB shipped to each task — the
#: edge of sane for a per-task dense matrix.  Operators whose input can
#: legitimately exceed it must offer a partitioned path (contrastive_topk's
#: chunked anchors), not a bigger bound.
DEFAULT_MAX_BROADCAST_ROWS = 100_000


class BroadcastContractError(ValueError):
    """A frame documented as metadata-scale exceeded its declared bound.

    Deliberately a ValueError subclass: callers that treat the bound as a
    configuration error can catch broadly, while operators with a
    partitioned fallback catch this precisely."""


def collect_bounded(
    df: DataFrame,
    max_rows: int = DEFAULT_MAX_BROADCAST_ROWS,
    what: str = "broadcast-contract frame",
) -> list[Row]:
    """Collect ``df`` to the driver, raising :class:`BroadcastContractError`
    if it holds more than ``max_rows`` rows.

    The probe is ``limit(max_rows + 1)`` — Spark stops producing rows at
    the limit, so an oversize frame costs one truncated scan, never a
    driver-side materialization of the whole thing.  NOTE: ``limit`` does
    not preserve any particular row order; every call site must sort the
    returned rows itself (they all did already — the collect order was
    never guaranteed either)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise BroadcastContractError(
            f"{what}: more than {max_rows} rows — this input is documented "
            "as metadata-scale (it is shipped to every task as a dense "
            "matrix); use the operator's partitioned path or tighten the "
            "input predicate"
        )
    return rows
