"""Custom stateful streaming operator: gap-based event sessionization via
``applyInPandasWithState`` (the BUILD-spec path for stateful semantics the
built-in windowed aggregates can't express).

A session = consecutive events of one user with gaps < ``gap_s`` seconds.
State per user = (session_start, last_ts, n_events, value_sum); a session is
emitted when a gap exceeds the threshold or the group times out past the
watermark. Batch-equivalence is tested by draining with availableNow and
comparing against a window-function batch sessionization.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("value_sum", T.DoubleType()),
])

def _ts(seconds: float) -> pd.Timestamp:
    """Float seconds -> microsecond-exact Timestamp (Arrow us precision)."""
    return pd.Timestamp(int(round(seconds * 1e6)), unit="us")


STATE_SCHEMA = T.StructType([
    T.StructField("start", T.DoubleType()),
    T.StructField("last", T.DoubleType()),
    T.StructField("n", T.LongType()),
    T.StructField("vsum", T.DoubleType()),
])


def sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """events stream (user_id, ts timestamp, value) -> closed sessions."""

    def fn(key: Tuple[Any], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start, last, n, vsum = state.get
                state.remove()
                yield pd.DataFrame({"user_id": [user_id],
                                    "session_start": [_ts(start)],
                                    "session_end": [_ts(last)],
                                    "n_events": [n], "value_sum": [round(vsum, 2)]})
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        if state.exists:
            start, last, n, vsum = state.get
        else:
            start = last = None
            n = 0
            vsum = 0.0
        out = []
        for ts, v in zip(rows["ts"], rows["value"]):
            t = ts.timestamp()
            if last is not None and t - last > gap_s:
                out.append((user_id, _ts(start), _ts(last), n, round(vsum, 2)))
                start, n, vsum = t, 0, 0.0
            if start is None:
                start = t
            last = t
            n += 1
            vsum += float(v)
        state.update((start, last, n, vsum))
        state.setTimeoutTimestamp(int((last + gap_s) * 1000))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "session_start",
                                             "session_end", "n_events",
                                             "value_sum"])

    return (events
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", f"{gap_s * 2} seconds")
            .groupBy("user_id")
            .applyInPandasWithState(fn, SESSION_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.EventTimeTimeout))


def batch_sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Window-function batch equivalent (for equivalence tests): a new
    session starts where the gap from the previous event exceeds gap_s."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    ev = (events.withColumn("ts", F.col("ts").cast("timestamp"))
          .withColumn("__prev", F.lag("ts").over(w))
          .withColumn("__new", (F.col("__prev").isNull()) |
                      (F.unix_timestamp("ts") - F.unix_timestamp("__prev") > gap_s))
          .withColumn("__sid", F.sum(F.col("__new").cast("int")).over(w)))
    return (ev.groupBy("user_id", "__sid")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.round(F.sum("value"), 2).alias("value_sum"))
            .drop("__sid"))
