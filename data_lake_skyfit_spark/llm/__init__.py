from . import dedup, encoder, multimodal, similarity, text

__all__ = ["dedup", "encoder", "multimodal", "similarity", "text"]
