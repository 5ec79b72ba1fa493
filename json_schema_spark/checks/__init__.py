from .drift import drift_report, ks_critical_value
from .invariants import span_sequence_mismatches
from .referential import dangling_ref_keys, dangling_refs, extract_refs
from .stats import column_stats, per_partition_stats
from .uniqueness import duplicate_key_rows, duplicate_keys, uniqueness_report

__all__ = [
    "column_stats",
    "dangling_ref_keys",
    "dangling_refs",
    "drift_report",
    "duplicate_key_rows",
    "duplicate_keys",
    "extract_refs",
    "ks_critical_value",
    "per_partition_stats",
    "span_sequence_mismatches",
    "uniqueness_report",
]
