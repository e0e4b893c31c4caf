"""Custom stateful streaming operators (applyInPandasWithState).

The reference is batch-only; a live crawl feed needs operators whose
correctness spans micro-batches. First-seen dedup is the canonical
one: a URL recrawled in a later batch must NOT re-enter the corpus —
per-key state (seen count) lives in the state store and survives
restarts via the checkpoint, which is the streaming twin of the batch
path's manifest resume (plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, TimestampType,
)

PAGE_OUT = StructType([
    StructField("url", StringType()),
    StructField("warc_ts", TimestampType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
])
_STATE = StructType([StructField("n_seen", LongType())])


def first_seen_dedup(pages: DataFrame, key_col: str = "url") -> DataFrame:
    """Streaming exact dedup: emit each key's FIRST arrival ever
    (within a micro-batch, the earliest warc_ts; across batches, the
    state store remembers). Output: url, warc_ts, text, lang.

    Scale shape: state is one int per distinct key, partitioned by the
    groupBy hash — the same key-sharding the batch exact_dedup shuffle
    uses, kept incremental.
    """
    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        n_seen = state.get[0] if state.exists else 0
        first = None
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
            cand = pdf.sort_values("warc_ts").iloc[0]
            if first is None or cand["warc_ts"] < first["warc_ts"]:
                first = cand
        state.update((n_seen + n_new,))
        if n_seen == 0 and first is not None:
            yield pd.DataFrame([{
                "url": first["url"], "warc_ts": first["warc_ts"],
                "text": first["text"], "lang": first["lang"],
            }])

    return (
        pages.select("url", "warc_ts", "text", "lang")
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, PAGE_OUT, _STATE, "append", GroupStateTimeout.NoTimeout)
    )


SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_seq", LongType()),
    StructField("n_events", LongType()),
    StructField("dur_us", LongType()),
])
_SESS_STATE = StructType([
    StructField("session_seq", LongType()),
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n_events", LongType()),
])


def sessionize_stream(events: DataFrame,
                      gap_us: int = 1_800_000_000) -> DataFrame:
    """Streaming sessionization — the incremental twin of the batch
    `sessionize` query (__spark_entry__.q_sessionize): a gap over
    gap_us (default 30 min) between consecutive events of a user
    starts a new session; each COMPLETED session emits one row
    (user_id, session_seq, n_events, dur_us) with exactly the batch
    query's values, so a session closed by the stream hashes equal to
    the same session computed by the batch window plan.

    Per-user state is four ints (open session's seq/start/last/count)
    in the state store, sharded by the groupBy hash — the same user_id
    key-sharding the batch window shuffle uses, kept incremental
    across micro-batches. A session closes when a later event of the
    SAME user arrives past the gap; feeds that need the final open
    sessions flushed append one sentinel event per user with
    ts > last + gap (the deterministic flush used by the
    batch-equivalence test — the sentinel's own one-event session
    stays open in state and is never emitted).

    Ordering contract: events must arrive time-ordered per user
    ACROSS micro-batches (in-batch disorder is fine — each batch is
    sorted on (ts, event_id) before folding). A feed with cross-batch
    late data needs a watermark+reorder stage upstream.
    """
    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            seq, start, last, n = state.get
        else:
            seq, start, last, n = 0, None, None, 0
        pdf = pd.concat(list(pdfs))
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(["ts", "event_id"])
        closed = []
        for us in pdf["ts"].astype("datetime64[us]").astype("int64"):
            us = int(us)
            if last is None or us - last > gap_us:
                if n > 0:
                    closed.append((int(key[0]), seq, n, last - start))
                seq += 1
                start = us
                n = 0
            n += 1
            last = us
        state.update((int(seq), int(start), int(last), int(n)))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_seq", "n_events", "dur_us"])

    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_OUT, _SESS_STATE, "append",
            GroupStateTimeout.NoTimeout)
    )
