"""A2 aggregation-container scaffolding (SensorThingsUtils.java:55-185).

The reference materializes, per base Datastream:

- three aggregate ObservedProperties ``<name> Min`` / ``<name> Max`` /
  ``<name> Dev`` with descriptions ``<desc> Minimum`` / ``Maximum`` /
  ``Standard deviation`` (``findOrCreateAggregateOps``, :128-155);
- one MultiDatastream per aggregation level, name ``<dsName> [1 hour]``
  / ``<dsName> [1 day]``, description ``<dsDesc> Aggregated hourly`` /
  ``Aggregated daily``, observed properties ``[base, Min, Max, Dev]``,
  the base uom repeated per property, and an ``aggregateFor`` property
  that CHAINS: the first level points at ``/Datastreams(<id>)``, each
  further level at the previous level's MultiDatastream
  (``findOrCreateDatastream`` w/ aggregates, :157-185).

Spark translation: pure column pipelines — the chain is computable
without iteration because entity ids are deterministic
(``xxhash64(entity_type, name)``, same scheme as upsert.find_or_create).
The aggregated VALUES (hourly/daily min/max/stddev) are the windowed
rollups (``q_events_hourly``; streaming variant in
``streaming/validators.py``) — the reference delegates those to a
separate aggregation service and only builds these containers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AGG_SUFFIXES = (("Min", "Minimum"), ("Max", "Maximum"), ("Dev", "Standard deviation"))

AGG_LEVELS = {
    "HOURLY": ("[1 hour]", "Aggregated hourly"),
    "DAILY": ("[1 day]", "Aggregated daily"),
}

_OM_MEASUREMENT = (
    "http://www.opengis.net/def/observationType/OGC-OM/2.0/OM_Measurement"
)


def _det_id(entity_type: str, key_col) -> F.Column:
    return F.concat(
        F.lit(f"{entity_type.lower()}-"),
        F.lower(F.hex(F.xxhash64(F.lit(entity_type), key_col))),
    )


def aggregate_observed_properties(obs_props: DataFrame) -> DataFrame:
    """-> one row per (base op x Min/Max/Dev): (name, description,
    base_name, aggregate, entity_id). SensorThingsUtils.java:128-155."""
    pairs = F.array(
        *[
            F.struct(F.lit(s).alias("sfx"), F.lit(w).alias("word"))
            for s, w in AGG_SUFFIXES
        ]
    )
    ex = obs_props.select(
        F.col("name").alias("base_name"),
        F.col("description").alias("base_desc"),
        F.explode(pairs).alias("__p"),
    )
    name = F.concat(F.col("base_name"), F.lit(" "), F.col("__p.sfx"))
    return ex.select(
        name.alias("name"),
        F.concat(F.col("base_desc"), F.lit(" "), F.col("__p.word")).alias(
            "description"
        ),
        F.col("base_name"),
        F.col("__p.sfx").alias("aggregate"),
        _det_id("ObservedProperty", name).alias("entity_id"),
    )


def aggregation_containers(
    datastreams: DataFrame,
    levels: tuple[str, ...] = ("HOURLY", "DAILY"),
) -> DataFrame:
    """-> one MultiDatastream container row per (datastream x level).

    Input needs (entity_id, name, description, obs_prop_name, uom_json).
    Output: (entity_id, name, description, level, aggregate_for,
    obs_prop_names, obs_prop_ids, uoms, data_types) with the
    ``aggregateFor`` chain of SensorThingsUtils.java:173-182.
    """
    parts = []
    for i, level in enumerate(levels):
        postfix, word = AGG_LEVELS[level]
        mds_name = F.concat(F.col("name"), F.lit(" " + postfix))
        if i == 0:
            agg_for = F.concat(
                F.lit("/Datastreams("), F.col("entity_id"), F.lit(")")
            )
        else:
            prev_postfix = AGG_LEVELS[levels[i - 1]][0]
            prev_mds_name = F.concat(F.col("name"), F.lit(" " + prev_postfix))
            agg_for = F.concat(
                F.lit("/MultiDatastreams("),
                _det_id("MultiDatastream", prev_mds_name),
                F.lit(")"),
            )
        op_names = F.array(
            F.col("obs_prop_name"),
            *[
                F.concat(F.col("obs_prop_name"), F.lit(" " + s))
                for s, _ in AGG_SUFFIXES
            ],
        )
        parts.append(
            datastreams.select(
                _det_id("MultiDatastream", mds_name).alias("entity_id"),
                mds_name.alias("name"),
                F.concat(F.col("description"), F.lit(" " + word)).alias(
                    "description"
                ),
                F.lit(level).alias("level"),
                agg_for.alias("aggregate_for"),
                op_names.alias("obs_prop_names"),
                F.transform(
                    op_names, lambda n: _det_id("ObservedProperty", n)
                ).alias("obs_prop_ids"),
                F.array_repeat(F.col("uom_json"), 1 + len(AGG_SUFFIXES)).alias(
                    "uoms"
                ),
                F.array_repeat(
                    F.lit(_OM_MEASUREMENT), 1 + len(AGG_SUFFIXES)
                ).alias("data_types"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
