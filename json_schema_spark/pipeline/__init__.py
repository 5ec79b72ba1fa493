from . import cache, curate, dedup, similarity, text

__all__ = ["cache", "curate", "dedup", "similarity", "text"]
