from . import (
    ann_index,
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
    "ann_index",
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
