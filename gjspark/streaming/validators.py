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
