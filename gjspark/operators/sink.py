"""Observation sinks: batched DataArray grouping, write-op metrics, and
parallel delete (reference S5/S6/S7 + A3/A4).

The reference uploads observations in per-(Multi)Datastream DataArray
batches of ``maxBatch`` (default 1000; the importer uses 100 —
``utils/ObservationUploader.java:128-183``, ``GeoJsonConverter.java:198``)
and counts per-row insert errors from the batch response (``:166-175``).
Spark translation:

- batching = ``groupBy(ds_key)`` + ``collect_list`` sliced into chunks of
  ``max_batch`` (one shuffle on the datastream key; batches form map-side
  partials first);
- metrics = plain aggregations over the op column (the reference's
  AtomicLong counters, ``ObservationUploader.java:83-114``);
- delete = anti-join rewrite (the Iceberg ``DELETE WHERE id IN``
  equivalent of the reference's thread-pooled per-entity HTTP deletes,
  ``utils/FrostUtils.java:134-160``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def batch_observations(
    obs: DataFrame, ds_col: str = "ds_key", max_batch: int = 1000
) -> DataFrame:
    """-> one row per (ds_key, batch_no): DataArray-style batches.

    Columns: ds_key, batch_no, n_obs, obs_ids (array), t_min, t_max.
    Deterministic batch membership (sorted by t_start, obs_id within the
    stream) so reruns produce identical batches.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(ds_col).orderBy("t_start", "obs_id")
    numbered = obs.withColumn(
        "__batch", ((F.row_number().over(w) - 1) / max_batch).cast("int")
    )
    return (
        numbered.groupBy(ds_col, F.col("__batch").alias("batch_no"))
        .agg(
            F.count("*").alias("n_obs"),
            F.sort_array(F.collect_list("obs_id")).alias("obs_ids"),
            F.min("t_start").alias("t_min"),
            F.max("t_start").alias("t_max"),
        )
    )


def op_metrics(df: DataFrame, op_col: str = "op") -> DataFrame:
    """Insert/update/noop/error counters (A3/A4) as one aggregation."""
    return df.groupBy(op_col).agg(F.count("*").alias("n"))


def count_errors(responses: DataFrame, status_col: str = "status") -> int:
    """Batch-response error accounting (``ObservationUploader.java:166-175``:
    locations prefixed 'error')."""
    return responses.filter(F.col(status_col).startswith("error")).count()


def delete_by_ids(
    table: DataFrame, ids: DataFrame, id_col: str = "obs_id"
) -> DataFrame:
    """S7 parallel delete as a distributed anti-join rewrite of the table
    (Iceberg: MERGE/DELETE produces the same plan)."""
    return table.join(F.broadcast(ids.select(id_col).distinct()), id_col, "left_anti")
