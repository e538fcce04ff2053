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
