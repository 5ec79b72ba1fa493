from .validate_stream import streaming_verdicts, validate_stream

__all__ = ["streaming_verdicts", "validate_stream"]
