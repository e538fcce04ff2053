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


def iceberg_runtime_available(spark) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_observations(
    df: DataFrame,
    target: str,
    fmt: str | None = None,
    mode: str = "append",
    merge_on: str | None = None,
    job_id: str = "obs-sink",
    id_col: str = "obs_id",
) -> str:
    """S5 observation sink (``utils/StaService.java:118-128`` analogue).

    ``target`` is either an Iceberg table identifier
    (``catalog.db.table``) or a filesystem path. Branches:

    - ``iceberg`` + ``merge_on``: ``MERGE INTO`` keyed on that column —
      the reference's update-existing-observation path;
    - ``iceberg`` append/replace: ``writeTo(target).append()`` /
      ``createOrReplace()`` (DataFrameWriterV2, so Iceberg commits are
      atomic snapshot swaps);
    - ``parquet``: the checkpointed atomic writer
      (``plans/checkpoint.checkpointed_write`` — per-partition lineage +
      write-then-manifest commit), the sandbox twin of the same
      semantics.

    ``fmt=None`` auto-detects: Iceberg when the runtime is on the
    classpath and ``target`` has no path separator, else parquet.
    Returns the branch taken (for metrics/logging).
    """
    spark = df.sparkSession
    if fmt is None:
        fmt = (
            "iceberg"
            if "/" not in target and iceberg_runtime_available(spark)
            else "parquet"
        )
    if fmt == "iceberg":
        if merge_on is not None:
            import uuid

            def q(ident: str) -> str:
                """Backtick-quote one identifier part (column name)."""
                return "`" + ident.replace("`", "``") + "`"

            def qt(ident: str) -> str:
                """Quote a possibly dotted table identifier part-wise."""
                return ".".join(q(p) for p in ident.split("."))

            # per-call unique view name: concurrent write_observations on
            # the same session must not clobber each other's source view
            view = f"__obs_incoming_{uuid.uuid4().hex}"
            df.createOrReplaceTempView(view)
            try:
                cols = df.columns
                key = q(merge_on)
                sets = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in cols)
                names = ", ".join(q(c) for c in cols)
                vals = ", ".join(f"s.{q(c)}" for c in cols)
                spark.sql(
                    f"MERGE INTO {qt(target)} t USING {q(view)} s "
                    f"ON t.{key} = s.{key} "
                    f"WHEN MATCHED THEN UPDATE SET {sets} "
                    f"WHEN NOT MATCHED THEN INSERT ({names}) VALUES ({vals})"
                )
            finally:
                spark.catalog.dropTempView(view)
        elif mode == "append":
            df.writeTo(target).append()
        else:
            df.writeTo(target).createOrReplace()
        return "iceberg"
    from gjspark.plans.checkpoint import checkpointed_write

    checkpointed_write(df, target, job_id=job_id, id_col=id_col)
    return "parquet"
