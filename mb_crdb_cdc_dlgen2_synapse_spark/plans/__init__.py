from .explain import explain_str, has_broadcast_join, pushed_filters, wholestage_codegen_spans
from .planner import (
    choose_dedup_strategy,
    choose_join_strategy,
    choose_knn_strategy,
    planned_equi_join,
    tx_size_estimate,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "wholestage_codegen_spans",
    "choose_dedup_strategy",
    "choose_join_strategy",
    "choose_knn_strategy",
    "planned_equi_join",
    "tx_size_estimate",
]
