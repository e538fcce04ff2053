"""Entity creators: features -> Location / Thing / FeatureOfInterest /
Sensor / ObservedProperty / Datastream / Observation DataFrames.

Generalizes the reference's per-feature Creator objects
(``geojson/CreatorLocation.java``, ``CreatorThing.java`` et al.) into
column pipelines. Each creator:

1. renders name/description/properties/cache-key templates (P1),
2. applies the ``ifNotEmpty`` guard — a configured guard template that
   renders blank skips the entity (P2, ``CreatorLocation.java:161-163``),
3. is skipped entirely when its name template is not configured (P3,
   ``CreatorLocation.java:158-160``),
4. emits a canonical preview row — the distributed analogue of the
   reference's ``generateTestOutput`` dry-run text
   (``GeoJsonConverter.java:139-160``), our golden-conformance surface.

Relationships become foreign-key columns resolved by joins (J4) instead
of object pointers: ``thing -> location_key``, ``datastream ->
(thing_key, sensor_key, obs_prop_key)``, ``observation ->
(datastream_key, foi_key)``.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gjspark.functions import geometry as G
from gjspark.operators.template import template_column


@dataclass
class CreatorConfig:
    """Template set for one entity class (mirrors the reference's per-
    creator config keys, README.md:54-88 example)."""

    entity_type: str
    template_name: str = ""
    template_description: str = ""
    template_properties: str = ""  # renders to a JSON object string
    template_cache_key: str = ""
    template_if_not_empty: str = ""
    with_geometry: bool = False  # Location/FoI carry the feature geometry
    extra_templates: dict[str, str] = field(default_factory=dict)

    @property
    def configured(self) -> bool:
        return bool(self.template_name)


PREVIEW_SCHEMA_FIELDS = [
    "feature_id",
    "feature_idx",
    "entity_type",
    "name",
    "description",
    "properties_json",
    "geometry_json",
    "cache_key",
]


def _geometry_json_col(df: DataFrame) -> F.Column:
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.StringType())
    def _geo(wkb: pd.Series) -> pd.Series:
        return wkb.map(
            lambda b: json.dumps(G.wkb_to_geojson(bytes(b)), sort_keys=True)
            if b is not None
            else None
        )

    return _geo(df["geometry"])


def create_entities(features: DataFrame, cfg: CreatorConfig) -> DataFrame | None:
    """features DF -> entity preview DF (None when not configured, P3)."""
    if not cfg.configured:
        return None
    props = F.col("properties")
    df = features.withColumn("name", template_column(cfg.template_name, props))
    if cfg.template_if_not_empty:
        guard = template_column(cfg.template_if_not_empty, props)
        df = df.filter(F.trim(guard) != "")
    df = df.filter(F.trim(F.col("name")) != "")  # blank name -> skip (P2)
    df = df.withColumn(
        "description",
        template_column(cfg.template_description, props)
        if cfg.template_description
        else F.lit(""),
    )
    if cfg.template_properties:
        rendered = template_column(cfg.template_properties, props)
        # parse/canonicalize the rendered JSON object (P4)
        from pyspark.sql.functions import pandas_udf

        @pandas_udf(T.StringType())
        def _canon(s: pd.Series) -> pd.Series:
            def canon(x):
                try:
                    return json.dumps(json.loads(x), sort_keys=True)
                except (ValueError, TypeError):
                    return None

            return s.map(canon)

        df = df.withColumn("properties_json", _canon(rendered))
    else:
        df = df.withColumn("properties_json", F.lit(None).cast("string"))
    df = df.withColumn(
        "geometry_json",
        _geometry_json_col(df) if cfg.with_geometry else F.lit(None).cast("string"),
    )
    df = df.withColumn(
        "cache_key",
        template_column(cfg.template_cache_key, props)
        if cfg.template_cache_key
        else F.col("name"),
    )
    df = df.withColumn("entity_type", F.lit(cfg.entity_type))
    extra = [
        template_column(t, props).alias(name)
        for name, t in cfg.extra_templates.items()
    ]
    return df.select(*PREVIEW_SCHEMA_FIELDS, *extra)


def preview(features: DataFrame, configs: list[CreatorConfig]) -> DataFrame:
    """All configured creators' outputs unioned — the engine's
    ``generateTestOutput`` analogue, compared row-for-row in conformance
    tests."""
    outs = [
        create_entities(features, c).select(*PREVIEW_SCHEMA_FIELDS)
        for c in configs
        if c.configured
    ]
    if not outs:
        raise ValueError("no creator configured")
    df = outs[0]
    for o in outs[1:]:
        df = df.unionByName(o)
    return df


def nuts_config() -> list[CreatorConfig]:
    """The README's NUTS example config (README.md:54-88) re-expressed:
    Location + Thing keyed `{type}-{NUTS_ID}`."""
    return [
        CreatorConfig(
            entity_type="Location",
            template_name="{NUTS_NAME}",
            template_description="Area {NAME_LATN|unknown}",
            template_properties=(
                '{"type": "{type}", "nutsId": "{NUTS_ID}", '
                '"level": {LEVL_CODE|0}, "country": "{CNTR_CODE}"}'
            ),
            template_cache_key="{type}-{NUTS_ID}",
            with_geometry=True,
        ),
        CreatorConfig(
            entity_type="Thing",
            template_name="{NUTS_NAME}",
            template_description="Region {NUTS_NAME}",
            template_properties=(
                '{"type": "{type}", "nutsId": "{NUTS_ID}", '
                '"nested": "{nested/a/b|none}"}'
            ),
            template_cache_key="{type}-{NUTS_ID}",
        ),
    ]


def graph_demo_configs() -> dict[str, CreatorConfig]:
    """Full-graph demo config over the NUTS fixture: every entity type
    the reference's converter creates (GeoJsonConverter.java:211-236),
    exercised by the q_graph contract query and its pure-Python golden
    (fixtures/generator.oracle_graph)."""
    return {
        "Location": CreatorConfig(
            entity_type="Location",
            template_name="{NUTS_NAME}",
            template_description="Area {NUTS_ID}",
            template_cache_key="{type}-{NUTS_ID}",
            with_geometry=True,
        ),
        "Thing": CreatorConfig(
            entity_type="Thing",
            template_name="{NUTS_NAME}",
            template_description="Region {NUTS_ID}",
            template_cache_key="{type}-{NUTS_ID}",
        ),
        "Sensor": CreatorConfig(
            entity_type="Sensor",
            template_name="sensor {CNTR_CODE}",
            template_cache_key="S-{CNTR_CODE}",
        ),
        "ObservedProperty": CreatorConfig(
            entity_type="ObservedProperty",
            template_name="op level {LEVL_CODE|0}",
            template_cache_key="OP-{LEVL_CODE|0}",
        ),
        "FeatureOfInterest": CreatorConfig(
            entity_type="FeatureOfInterest",
            template_name="foi {NUTS_ID}",
            template_description="FoI {NUTS_NAME}",
            template_cache_key="F-{NUTS_ID}",
            with_geometry=True,
        ),
        "Datastream": CreatorConfig(
            entity_type="Datastream",
            template_name="ds {NUTS_ID}",
            template_cache_key="DS-{NUTS_ID}",
            extra_templates={
                "thing_key": "{type}-{NUTS_ID}",
                "sensor_key": "S-{CNTR_CODE}",
                "obs_prop_key": "OP-{LEVL_CODE|0}",
            },
        ),
        "MultiDatastream": CreatorConfig(
            entity_type="MultiDatastream",
            template_name="mds {CNTR_CODE}",
            template_cache_key="MDS-{CNTR_CODE}",
            extra_templates={
                "thing_key": "{type}-{NUTS_ID}",
                "sensor_key": "S-{CNTR_CODE}",
                "obs_prop_keys": '["OP-0", "OP-{LEVL_CODE|0}"]',
            },
        ),
        "Observation": CreatorConfig(
            entity_type="Observation",
            template_name="obs {NUTS_ID}",
            template_cache_key="O-{NUTS_ID}",
            extra_templates={
                "datastream_key": "DS-{NUTS_ID}",
                "foi_key": "F-{NUTS_ID}",
            },
        ),
    }


# ---------------------------------------------------------------------------
# FK resolution (J4): relationships as key joins
# ---------------------------------------------------------------------------


def resolve_fk(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str = "cache_key",
    parent_id: str = "entity_id",
    fk_name: str | None = None,
) -> DataFrame:
    """Resolve a rendered key column to the parent's entity id by
    broadcast equi-join (the reference finds parents via rendered cache
    keys: ``geojson/CreatorDatastream.java:201-203``,
    ``geojson/CreatorObservation.java:181-187``). Unresolved keys keep a
    NULL fk — the caller decides drop vs fail."""
    fk_name = fk_name or f"{child_key}_id"
    p = F.broadcast(
        parent.select(
            F.col(parent_key).alias("__pk"), F.col(parent_id).alias(fk_name)
        ).dropDuplicates(["__pk"])
    )
    return child.join(p, child[child_key] == p["__pk"], "left").drop("__pk")


def sensorthings_graph(
    features: DataFrame,
    configs: dict[str, CreatorConfig],
    snapshots: dict[str, DataFrame] | None = None,
) -> dict[str, DataFrame]:
    """Build the full SensorThings entity graph from a features DF:
    Location -> Thing (linked) -> FeatureOfInterest -> Datastream (FKs to
    Thing/Sensor/ObservedProperty) -> MultiDatastream (FKs to Thing/
    Sensor + obs-prop id list) -> Observation (FKs to Datastream or
    MultiDatastream, and FeatureOfInterest), all as find-or-create
    upserts + broadcast FK joins — the distributed translation of the
    reference's fixed per-feature creator order
    (``geojson/GeoJsonConverter.java:211-236``, FoI at ``:214``;
    FoI find-or-create ``utils/FrostUtils.java:356-382``;
    MultiDatastream ``utils/FrostUtils.java:545-619`` — its update diff
    covers name/description/properties, with dataTypes generated as one
    OM_Measurement per observed property on create;
    Observation->FoI link ``geojson/CreatorObservation.java:184-187``)."""
    from gjspark.operators.upsert import find_or_create

    snapshots = snapshots or {}
    out: dict[str, DataFrame] = {}
    for etype in (
        "Location", "Thing", "Sensor", "ObservedProperty",
        "FeatureOfInterest", "Datastream", "MultiDatastream",
        "Observation",
    ):
        cfg = configs.get(etype)
        if cfg is None or not cfg.configured:
            continue
        ents = create_entities(features, cfg)
        if etype != "Observation":
            # cache semantics: the first feature creates the entity, later
            # features with the same rendered key reuse it
            # (utils/EntityCache.java:124-127) -> keep-first dedup
            from pyspark.sql import Window

            w = Window.partitionBy("cache_key").orderBy("feature_idx")
            ents = (
                ents.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        ents = find_or_create(
            ents, snapshots.get(etype), etype, check_ambiguous=False
        )
        if etype == "Thing" and "Location" in out:
            ents = resolve_fk(
                ents,
                out["Location"].select("cache_key", "entity_id"),
                child_key="cache_key",
                fk_name="location_id",
            )
        if etype in ("Datastream", "MultiDatastream"):
            for parent, key_col in (
                ("Thing", "thing_key"),
                ("Sensor", "sensor_key"),
                ("ObservedProperty", "obs_prop_key"),
            ):
                if parent in out and key_col in ents.columns:
                    ents = resolve_fk(
                        ents,
                        out[parent].select("cache_key", "entity_id"),
                        child_key=key_col,
                        fk_name=f"{parent.lower()}_id",
                    )
        if etype == "MultiDatastream":
            if "obs_prop_keys" in ents.columns and "ObservedProperty" in out:
                ents = resolve_fk_list(
                    ents,
                    out["ObservedProperty"].select("cache_key", "entity_id"),
                    keys_col="obs_prop_keys",
                    fk_name="obs_prop_ids",
                )
                # dataTypes: one OM_Measurement per observed property
                # (FrostUtils.java:573-576)
                ents = ents.withColumn(
                    "data_types",
                    F.transform(
                        F.col("obs_prop_ids"),
                        lambda _: F.lit(
                            "http://www.opengis.net/def/observationType/"
                            "OGC-OM/2.0/OM_Measurement"
                        ),
                    ),
                )
        if etype == "Observation":
            if "Datastream" in out and "datastream_key" in ents.columns:
                ents = resolve_fk(
                    ents,
                    out["Datastream"].select("cache_key", "entity_id"),
                    child_key="datastream_key",
                    fk_name="datastream_id",
                )
            if "MultiDatastream" in out and "mds_key" in ents.columns:
                ents = resolve_fk(
                    ents,
                    out["MultiDatastream"].select("cache_key", "entity_id"),
                    child_key="mds_key",
                    fk_name="multidatastream_id",
                )
            if "FeatureOfInterest" in out and "foi_key" in ents.columns:
                ents = resolve_fk(
                    ents,
                    out["FeatureOfInterest"].select("cache_key", "entity_id"),
                    child_key="foi_key",
                    fk_name="foi_id",
                )
        out[etype] = ents
    return out


def resolve_fk_list(
    child: DataFrame,
    parent: DataFrame,
    keys_col: str,
    parent_key: str = "cache_key",
    parent_id: str = "entity_id",
    fk_name: str = "fk_ids",
) -> DataFrame:
    """Resolve a rendered JSON-array-of-keys column to an ordered list of
    parent entity ids (MultiDatastream -> ObservedProperties,
    ``utils/FrostUtils.java:578``): posexplode the key array, broadcast-
    join each key, re-assemble ordered by position. Unresolved keys keep
    NULL in place (caller decides drop vs fail)."""
    keys_arr = F.from_json(F.col(keys_col), T.ArrayType(T.StringType()))
    exploded = child.select(
        F.col("cache_key").alias("__ck"), F.posexplode(keys_arr).alias("__pos", "__k")
    )
    p = F.broadcast(
        parent.select(
            F.col(parent_key).alias("__k"), F.col(parent_id).alias("__pid")
        ).dropDuplicates(["__k"])
    )
    resolved = (
        exploded.join(p, "__k", "left")
        .groupBy("__ck")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__pid")))
            ).alias("__pairs")
        )
        .select(
            "__ck",
            F.transform(F.col("__pairs"), lambda s: s["__pid"]).alias(fk_name),
        )
    )
    return child.join(
        F.broadcast(resolved),
        child["cache_key"] == resolved["__ck"],
        "left",
    ).drop("__ck")
