from . import (
    cdc,
    codecs,
    dedup,
    multimodal,
    pq,
    relational,
    similarity,
    textops,
)

__all__ = [
    "cdc",
    "codecs",
    "dedup",
    "multimodal",
    "pq",
    "relational",
    "similarity",
    "textops",
]
