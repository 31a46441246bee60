from . import (
    bpe,
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
    "bpe",
    "cdc",
    "codecs",
    "dedup",
    "multimodal",
    "pq",
    "relational",
    "similarity",
    "textops",
]
