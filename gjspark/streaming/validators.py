"""Streaming validators: the V2/V3 semantics over an unbounded source.

- ``stream_dedup_by_phen_time``: ValidatorByPhenTime as watermarked
  ``dropDuplicates`` on (ds_key, t_start) — late duplicates beyond the
  watermark are dropped by construction, matching the batch validator's
  keep-first semantics within the watermark horizon.
- ``stream_latest_per_stream``: ValidatorNewer's state (max phenomenon
  time per datastream) as a streaming aggregation.

Both are plain Structured Streaming graphs (no custom state): watermark +
dropDuplicates / groupBy-max is exactly the engine-level translation
of ``validator/ValidatorByPhenTime.java:163-190`` and
``validator/ValidatorNewer.java:75-113``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_by_phen_time(
    obs_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Drop re-deliveries of the same (ds_key, phenomenonTime)."""
    return obs_stream.withWatermark("t_start", watermark).dropDuplicates(
        ["ds_key", "t_start"]
    )


def stream_latest_per_stream(
    obs_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Running max phenomenonTime per datastream (ValidatorNewer state)."""
    return (
        obs_stream.withWatermark("t_start", watermark)
        .groupBy("ds_key")
        .agg(F.max("t_start").alias("latest_t"))
    )


def stream_hourly_rollup(obs_stream: DataFrame, value_col: str = "value") -> DataFrame:
    """A2 windowed min/max/stddev as a streaming windowed aggregation
    (the reference only creates the aggregate containers; FROST-Server
    computes values — here the engine computes them on the stream)."""
    return (
        obs_stream.withWatermark("t_start", "2 hours")
        .groupBy("ds_key", F.window("t_start", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
            F.stddev(value_col).alias("stddev_v"),
        )
        .select(
            "ds_key",
            F.col("w.start").alias("window_start"),
            "n",
            "min_v",
            "max_v",
            "stddev_v",
        )
    )


def stream_validator_newer(obs_stream: DataFrame) -> DataFrame:
    """ValidatorNewer as a CUSTOM STATEFUL operator
    (``applyInPandasWithState``): per datastream, emit an observation
    only if its phenomenonTime is strictly newer than every observation
    seen before it — the exact order-sensitive semantics of
    ``validator/ValidatorNewer.java:75-113`` (an incoming obs older than
    the running latest is dropped even if it is newer than the last
    *emitted* one). Not expressible as watermark+dropDuplicates (which
    keys on equality) or groupBy-max (which loses the per-row emit
    decision); the running ``latest`` per key lives in the state store
    and survives across micro-batches.

    Within a micro-batch rows are processed in ascending t_start
    (deterministic); the state schema keeps epoch-micros (state-store
    friendly fixed width).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_cols = ["ds_key", "obs_id", "t_start"]

    def fn(key, pdfs, state: GroupState):
        latest_us = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("t_start", kind="stable")
            for obs_id, t in zip(pdf["obs_id"], pdf["t_start"]):
                t_us = int(pd.Timestamp(t).value // 1000)
                if latest_us is None or t_us > latest_us:
                    rows.append((key[0], obs_id, t))
                    latest_us = t_us
        if latest_us is not None:
            state.update((latest_us,))
        if rows:
            yield pd.DataFrame(rows, columns=out_cols)

    return obs_stream.groupBy("ds_key").applyInPandasWithState(
        fn,
        outputStructType="ds_key string, obs_id string, t_start timestamp",
        stateStructType="latest_us long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
