from .invariants import span_sequence_mismatches

__all__ = ["span_sequence_mismatches"]
