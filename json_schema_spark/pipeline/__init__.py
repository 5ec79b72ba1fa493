from . import cache, dedup, similarity, text

__all__ = ["cache", "dedup", "similarity", "text"]
