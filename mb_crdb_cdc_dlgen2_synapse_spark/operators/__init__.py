from . import cdc, dedup, multimodal, relational, similarity, textops

__all__ = ["cdc", "dedup", "multimodal", "relational", "similarity", "textops"]
