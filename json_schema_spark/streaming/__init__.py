from .curate_stream import curate_stream, curated_survivors
from .dedup_stream import dedup_stream, dedup_stream_global
from .lsh_stream import lsh_candidates_stream
from .sessions_stream import sessionize_stream
from .validate_stream import streaming_verdicts, validate_stream

__all__ = ["curate_stream", "curated_survivors", "dedup_stream",
           "dedup_stream_global", "lsh_candidates_stream",
           "sessionize_stream", "streaming_verdicts", "validate_stream"]
