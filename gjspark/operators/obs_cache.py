"""W2: ObsCache — windowed existing-observation fetch with lazy range
extension and duplicate cleanup (``validator/ObsCache.java:40-140``).

The reference keeps, per datastream, a phenomenonTime-keyed map of
existing observations loaded lazily from the earliest checked instant
forward (extending downward when an earlier check arrives), and — with
``deleteDuplicates`` — deletes previously-loaded rows that share a
phenomenonTime with a newer load.

Spark-first translation: the "cache" is a *time-range-pruned read* of the
existing table. The per-datastream minimum incoming phenomenonTime is the
range bound (exactly what the reference's first query uses,
``ObsCache.java:95-99``); broadcasting those bounds into the scan filter
lets parquet/Iceberg prune row groups by min/max stats, so the engine
reads only the window a validator can possibly touch — the distributed
equivalent of never loading obs older than the cache start. There is no
driver-side statefulness to port: lazy *extension* is subsumed because
the bound is computed from ALL incoming rows up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pruned_existing(
    existing: DataFrame,
    incoming: DataFrame,
    ds_col: str = "ds_key",
    t_col: str = "t_start",
) -> DataFrame:
    """Existing observations restricted to t >= per-datastream min
    incoming time (the reference's ``phenomenonTime ge <cacheStart>``
    filter). Datastreams with no incoming rows are dropped entirely —
    the reference never loads their cache at all."""
    bounds = incoming.groupBy(ds_col).agg(F.min(t_col).alias("__t_min"))
    return (
        existing.join(F.broadcast(bounds), ds_col)
        .filter(F.col(t_col) >= F.col("__t_min"))
        .drop("__t_min")
    )


def duplicate_cleanup(
    existing: DataFrame,
    ds_col: str = "ds_key",
    t_col: str = "t_start",
    id_col: str = "obs_id",
) -> tuple[DataFrame, DataFrame]:
    """deleteDuplicates branch (``ObsCache.java:120-140``): rows sharing
    (datastream, phenomenonTime) collapse to one survivor; the rest are
    returned as the delete set. The reference keeps the last-loaded row
    (server order); distributed we keep the max id — deterministic under
    any partitioning."""
    from pyspark.sql import Window

    w = Window.partitionBy(ds_col, t_col).orderBy(F.col(id_col).desc())
    ranked = existing.withColumn("__rn", F.row_number().over(w))
    kept = ranked.filter(F.col("__rn") == 1).drop("__rn")
    to_delete = ranked.filter(F.col("__rn") > 1).drop("__rn")
    return kept, to_delete
