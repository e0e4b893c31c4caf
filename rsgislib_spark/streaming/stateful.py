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
