"""Observation validators V1-V7 (reference ``validator/*.java``) as
DataFrame transforms — the reference's closest analogue to stateful
dedup/late-data handling (SURVEY.md §2.7).

Observation schema: (obs_id, ds_key, t_start timestamp,
t_end timestamp nullable — NULL means instant, else interval —
result string/JSON, params_json string).

Each validator returns the *passing* subset; semantics mirror the
per-observation server checks:

- V2 ValidatorNewer  (``ValidatorNewer.java:48-73``): drop unless strictly
  newer than the stream's latest known time (interval -> its start).
- V3 ValidatorByPhenTime (``ValidatorByPhenTime.java:163-190``): an
  existing observation at the same (ds, phenomenonTime) drops the new one;
  with ``update=True`` a differing result adopts the existing id instead
  (update branch). Duplicate cleanup keeps the latest id per key
  (``ObsCache.java:119-141``).
- V4 ValidatorByParameter (``ValidatorByParameter.java:79-149``): exists
  with equal parameter values (optionally + phenTime) -> drop.
- V5/V6 Before/After (``ValidatorBefore/After.java:48-66``): cutoff
  filters; the cutoff is a job parameter for determinism (the reference
  uses configure-time ``Instant.now()``).
- V7 ValidatorMulti (``ValidatorMulti.java:66-74``): logical AND = chained
  application.

All of these are broadcast/shuffle equi-joins + filters — no UDFs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _eff_t():
    """Effective phenomenonTime: intervals count by their start
    (ValidatorNewer.java:60-66 uses TimeInterval start)."""
    return F.col("t_start")


def validator_null(obs: DataFrame) -> DataFrame:
    """V1: always pass (Validator.java:41-49)."""
    return obs


def validator_newer(obs: DataFrame, existing: DataFrame) -> DataFrame:
    """V2: keep obs strictly newer than the per-stream max existing time."""
    latest = existing.groupBy("ds_key").agg(F.max(_eff_t()).alias("__latest"))
    return (
        obs.join(F.broadcast(latest), "ds_key", "left")
        .filter(F.col("__latest").isNull() | (_eff_t() > F.col("__latest")))
        .drop("__latest")
    )


def validator_by_phen_time(
    obs: DataFrame, existing: DataFrame, update: bool = False
) -> DataFrame:
    """V3: same (ds_key, t_start, t_end) exists -> drop; with update=True
    and a differing result, emit the row with the existing obs_id and
    op='update' instead of dropping."""
    ex = existing.select(
        "ds_key",
        F.col("t_start").alias("__ex_ts"),
        F.col("t_end").alias("__ex_te"),
        F.col("obs_id").alias("__ex_id"),
        F.col("result").alias("__ex_result"),
    )
    j = obs.join(
        ex,
        (obs["ds_key"] == ex["ds_key"])
        & (obs["t_start"].eqNullSafe(F.col("__ex_ts")))
        & (obs["t_end"].eqNullSafe(F.col("__ex_te"))),
        "left",
    ).drop(ex["ds_key"])
    if update:
        out = j.filter(
            F.col("__ex_id").isNull() | (F.col("result") != F.col("__ex_result"))
        ).withColumn(
            "op",
            F.when(F.col("__ex_id").isNull(), F.lit("create")).otherwise(
                F.lit("update")
            ),
        )
        out = out.withColumn(
            "obs_id",
            F.when(F.col("__ex_id").isNull(), F.col("obs_id")).otherwise(
                F.col("__ex_id")
            ),
        )
    else:
        out = j.filter(F.col("__ex_id").isNull()).withColumn("op", F.lit("create"))
    return out.drop("__ex_ts", "__ex_te", "__ex_id", "__ex_result")


def dedup_keep_latest(obs: DataFrame) -> DataFrame:
    """ObsCache duplicate cleanup: one row per (ds_key, t_start, t_end),
    keeping the greatest obs_id (the reference deletes all but the last
    created, ``ObsCache.java:119-141``)."""
    w = Window.partitionBy("ds_key", "t_start", "t_end").orderBy(
        F.col("obs_id").desc()
    )
    return obs.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")


def validator_by_parameter(
    obs: DataFrame,
    existing: DataFrame,
    with_phen_time: bool = False,
) -> DataFrame:
    """V4: left-anti join on equal params_json (optionally + time).
    Null-safe equality so NULL t_end (instant obs) matches NULL."""
    keys = ["ds_key", "params_json"] + (
        ["t_start", "t_end"] if with_phen_time else []
    )
    ex = existing.select(*[F.col(k).alias(f"__x_{k}") for k in keys]).distinct()
    cond = None
    for k in keys:
        c = obs[k].eqNullSafe(F.col(f"__x_{k}"))
        cond = c if cond is None else (cond & c)
    return obs.join(ex, cond, "left_anti")


def validator_before(obs: DataFrame, cutoff) -> DataFrame:
    """V5: pass when obs time is before the cutoff (obs older than)."""
    return obs.filter(_eff_t() < F.lit(cutoff))


def validator_after(obs: DataFrame, cutoff) -> DataFrame:
    """V6: pass when obs time is after the cutoff."""
    return obs.filter(_eff_t() > F.lit(cutoff))


def validator_multi(
    obs: DataFrame, validators: list[Callable[[DataFrame], DataFrame]]
) -> DataFrame:
    """V7: AND of child validators = function composition."""
    for v in validators:
        obs = v(obs)
    return obs


def phenomenon_start():
    """P15: interval -> start instant (FrostUtils.java:710-716)."""
    return F.col("t_start")


def phenomenon_midpoint():
    """P15: interval -> midpoint instant; instants pass through
    (FrostUtils.java:841-904 interval handling). Microsecond-precise:
    the reference is Instant-precise (start + duration/2), so averaging
    at whole-second granularity would diverge by up to ~1s. The micros
    sum stays < 2^53, so the double division is exact."""
    return F.when(
        F.col("t_end").isNotNull(),
        F.timestamp_micros(
            ((F.unix_micros("t_start") + F.unix_micros("t_end")) / 2).cast("long")
        ),
    ).otherwise(F.col("t_start"))
