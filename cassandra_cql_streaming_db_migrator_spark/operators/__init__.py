"""Operator library — one module per SURVEY.md §2 family.

Every operator is a pure DataFrame -> DataFrame combinator: the engine
declares logical plans and lets Catalyst choose physical strategies
(pushdown, broadcast, codegen).  Nothing here collects to the driver.
"""

from .filters import apply_filter_chain, memory_filter, pushdown_filter
from .compute import hash_bucket_column, with_computed_columns
from .project import column_mapping
from .limits import read_limit, top_k
from .anti_join import if_not_exists_filter
from .counter import counter_merge
from .ttl import ttl_preserving_columns

__all__ = [
    "apply_filter_chain",
    "memory_filter",
    "pushdown_filter",
    "with_computed_columns",
    "hash_bucket_column",
    "column_mapping",
    "read_limit",
    "top_k",
    "if_not_exists_filter",
    "counter_merge",
    "ttl_preserving_columns",
]
