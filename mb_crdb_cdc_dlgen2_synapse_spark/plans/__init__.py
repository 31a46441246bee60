from .explain import explain_str, has_broadcast_join, pushed_filters, wholestage_codegen_spans

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "pushed_filters",
    "wholestage_codegen_spans",
]
