"""Streaming sessionization: the custom stateful operator the built-in
streaming aggregates can't express.

Gap-based session COUNTING needs per-key state of "timestamp of the last
event seen" — ``session_window`` handles windowed aggregation but not a
running per-user session/event tally, and ``dropDuplicates*`` state is
membership-only. ``applyInPandasWithState`` is Spark's escape hatch for
exactly this: per-key Arrow-batched state with explicit update semantics.

State per user is THREE scalars (last event micros, event count, session
count) — O(users), not O(events): the bounded-state shape that survives an
unbounded stream.

Hot-key bound: the stateful groupBy serializes each user into one task
per micro-batch — a bot user emitting most of a batch's events becomes a
straggler for that batch (state itself stays 3 scalars). That is the
inherent shape of per-key ordered folding (DuckDB/Flink keyed state has
the same bound); mitigation for pathological keys is upstream
rate-limiting or pre-aggregating same-timestamp events per key — the
cross-batch fold is already O(batch slice), never O(history). Events inside a micro-batch are sorted before folding;
cross-batch order is the stream's arrival order (process-time semantics —
the batch job over the full corpus is the backstop for late data, same
contract as the exact-dedup stream's watermark bound).

Semantics mirror the batch ``q_user_sessions`` oracle exactly: a session
opens when the gap to the previous event exceeds ``gap_us`` microseconds
(integer micros — ``unix_micros``, not second-truncating
``unix_timestamp``); same-instant events share a session. A replayed
in-order stream therefore reproduces the batch result bit-for-bit
(stream==batch pytest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize_stream(stream_df: DataFrame, gap_us: int = 3_600_000_000,
                      ts_col: str = "ts",
                      user_col: str = "user_id") -> DataFrame:
    """Running (user_id, n_events, n_sessions) per user, emitted each
    micro-batch the user appears in (use outputMode("update")). Returns a
    streaming DataFrame; caller attaches the sink."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = "user_id string, n_events bigint, n_sessions bigint"
    state_schema = "last_us bigint, n_events bigint, n_sessions bigint"

    def fold(key, pdfs, state):
        if state.exists:
            last_us, n_ev, n_se = state.get
        else:
            last_us, n_ev, n_se = None, 0, 0
        # applyInPandasWithState yields MULTIPLE Arrow chunks per key per
        # micro-batch (arrow.maxRecordsPerBatch), and cross-chunk order
        # after the groupBy shuffle is arbitrary — sorting per chunk would
        # over-count sessions. Gather the key's whole micro-batch slice and
        # sort ONCE; memory is bounded by that slice, not the stream.
        vals = sorted(int(v) for pdf in pdfs for v in pdf["__us"])
        for v in vals:
            if last_us is None or v - last_us > gap_us:
                n_se += 1
            n_ev += 1
            last_us = v
        state.update((int(last_us), int(n_ev), int(n_se)))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n_ev],
                            "n_sessions": [n_se]})

    # NULL timestamps (or NULL users) are dropped BEFORE the stateful fold:
    # one NULL would arrive as NaN in the Arrow batch, int(NaN) would raise
    # inside fold, and the failed micro-batch replays forever — a
    # permanently wedged query over one bad row
    prepared = (stream_df
                .where(F.col(ts_col).isNotNull()
                       & F.col(user_col).isNotNull())
                .select(F.col(user_col).cast("string").alias("user_id"),
                        F.unix_micros(F.col(ts_col).cast("timestamp"))
                        .alias("__us")))
    return prepared.groupBy("user_id").applyInPandasWithState(
        fold, out_schema, state_schema, "update",
        GroupStateTimeout.NoTimeout)
