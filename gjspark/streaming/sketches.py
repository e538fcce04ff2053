"""Streaming distinct-count sketches: windowed HLL register build over
an unbounded source.

The register build IS an ordinary streaming aggregation —
``groupBy(window, group, bucket).max(rho)`` — so Structured Streaming's
own state store holds at most ``groups x m`` registers per open window
(constant state per group, the whole point of sketching an unbounded
stream). Watermarking closes windows and emits final register rows in
append mode; the batch estimator
(:func:`gjspark.operators.sketches.estimate_from_registers`) folds any
collection of emitted register rows into estimates — per window, or
max-merged across windows for a running total (registers merge by
bucket-max, by construction).

Contrast with exact streaming ``approx_count_distinct``/distinct
aggregation: exact distinct state grows with the number of distinct
values seen; the sketch state does not. At 10^12 events/day this is the
only viable shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gjspark.operators.sketches import bucket_rho_exprs


def stream_hll_registers(
    stream: DataFrame,
    value_col: str,
    ts_col: str = "t_start",
    group_cols: tuple[str, ...] = (),
    window: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 8,
) -> DataFrame:
    """-> streaming frame of (window_start, group..., bucket, m_reg).

    Append-mode-compatible (aggregation keyed on the event-time window
    under a watermark); feed the emitted rows to
    ``estimate_from_registers`` grouped by (window_start, group...) for
    per-window distinct estimates.
    """
    bucket, rho = bucket_rho_exprs(value_col, p)
    return (
        stream.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), *group_cols, bucket, rho)
        .groupBy(
            F.window(ts_col, window).alias("w"), *group_cols, F.col("bucket")
        )
        .agg(F.max("rho").alias("m_reg"))
        .select(
            F.col("w.start").alias("window_start"), *group_cols, "bucket", "m_reg"
        )
    )
