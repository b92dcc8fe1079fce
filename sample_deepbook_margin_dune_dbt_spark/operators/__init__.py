from . import dedup, similarity, multimodal

__all__ = ["dedup", "similarity", "multimodal"]
