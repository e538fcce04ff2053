"""GeoJSON FeatureCollection source -> features DataFrame.

Reference behavior generalized (NOT ported): the reference Jackson-parses a
single file into an in-memory Feature list and iterates it
(``GeoJsonImportController.java:131-164``, loop
``geojson/GeoJsonConverter.java:185-196``). Here each *file* is the unit of
distribution: ``binaryFile`` scan -> ``mapInPandas`` parse -> one row per
Feature. At 100 TB scale a directory of FeatureCollection files parses fully
in parallel; a stable ``feature_idx`` preserves within-file input order
(the reference's processing order) and ``source_file`` feeds lineage.

Output schema (SURVEY.md §1.1):
    feature_id STRING, feature_idx LONG, geom_type STRING,
    geometry BINARY (WKB, EPSG:4326), properties STRING (canonical JSON),
    source_file STRING, lon DOUBLE, lat DOUBLE (point geometries only)

Geometry types Point/Polygon/MultiPolygon get WKB + optional CRS
re-projection with HALF_EVEN scale-6 rounding (parity with
``utils/FrostUtils.java:915-1010``); other types pass through with NULL
geometry, as the reference leaves them untouched
(``geojson/CreatorLocation.java:193-203``).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from gjspark.functions import geometry as G
from gjspark.functions.crs import parse_crs, round_half_even, to_wgs84

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("feature_id", T.StringType()),
        T.StructField("feature_idx", T.LongType()),
        T.StructField("geom_type", T.StringType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("properties", T.StringType()),
        T.StructField("source_file", T.StringType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ]
)


def _transform_coords(coords: np.ndarray, epsg, flip: bool, scale: int) -> np.ndarray:
    """(n,2) source-CRS coords -> rounded WGS84 lon/lat."""
    x, y = coords[:, 0].copy(), coords[:, 1].copy()
    if flip:
        x, y = y, x
    lon, lat = to_wgs84(x, y, epsg)
    return np.column_stack(
        [round_half_even(lon, scale), round_half_even(lat, scale)]
    )


def feature_to_row(
    feat: dict, idx: int, source_file: str, crs: str | None = None,
    flip: bool = False, number_scale: int = 6,
    crs_template: str | None = None,
):
    """One GeoJSON Feature dict -> features-schema tuple."""
    geom = feat.get("geometry") or {}
    gtype = geom.get("type")
    props = feat.get("properties") or {}
    if crs_template:
        # per-feature templated CRS (CreatorFeature.java:60-63: "Template
        # used to generate the crs, using {path/to/field|default}
        # placeholders"), rendered against the feature's properties
        from gjspark.operators.template import render_template

        rendered = render_template(crs_template, props).strip()
        eff_crs = rendered or crs
    else:
        # per-feature CRS override via properties (fixture convention)
        eff_crs = props.get("crs", crs)
    epsg = parse_crs(eff_crs)
    eff_flip = flip
    if epsg is not None and epsg == 4326 and str(eff_crs).lower().startswith("urn:"):
        # URN-form EPSG:4326 is LAT,LON axis order (UtilsTest.java:40-48)
        eff_flip = not flip
    wkb = None
    lon = lat = None
    if gtype == "Point":
        c = _transform_coords(
            np.array([geom["coordinates"][:2]], dtype=np.float64),
            epsg, eff_flip, number_scale,
        )
        lon, lat = float(c[0, 0]), float(c[0, 1])
        wkb = G.point_wkb(lon, lat)
    elif gtype == "Polygon":
        rings = [
            _transform_coords(np.asarray(r, dtype=np.float64)[:, :2], epsg, eff_flip, number_scale)
            for r in geom["coordinates"]
        ]
        wkb = G.polygon_wkb(rings)
    elif gtype == "MultiPolygon":
        polys = [
            [
                _transform_coords(np.asarray(r, dtype=np.float64)[:, :2], epsg, eff_flip, number_scale)
                for r in rings
            ]
            for rings in geom["coordinates"]
        ]
        wkb = G.multipolygon_wkb(polys)
    fid = feat.get("id")
    if fid is None:
        fid = f"{source_file}#{idx}"
    return (
        str(fid),
        idx,
        gtype,
        wkb,
        json.dumps(props, sort_keys=True, ensure_ascii=False),
        source_file,
        lon,
        lat,
    )


def _parse_files(
    batches: Iterator[pd.DataFrame], crs: str | None, flip: bool,
    number_scale: int, crs_template: str | None = None,
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            doc = json.loads(bytes(content).decode("utf-8"))
            if doc.get("type") != "FeatureCollection":
                raise ValueError(f"{path}: not a FeatureCollection")  # parity:
                # GeoJsonImportController.java:146-153 rejects non-FC input
            for idx, feat in enumerate(doc.get("features", [])):
                rows.append(
                    feature_to_row(
                        feat, idx, path, crs, flip, number_scale, crs_template
                    )
                )
        yield pd.DataFrame(
            rows, columns=[f.name for f in FEATURES_SCHEMA.fields]
        )


def read_feature_collection(
    spark: SparkSession,
    path: str,
    crs: str | None = None,
    flip: bool = False,
    number_scale: int = 6,
    crs_template: str | None = None,
) -> DataFrame:
    """Distributed FeatureCollection scan: one task per file.

    ``crs_template``: the reference's per-feature CRS template
    (CreatorFeature.java:60-63), rendered against each feature's
    properties; blank render falls back to ``crs``."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(
        lambda it: _parse_files(it, crs, flip, number_scale, crs_template),
        FEATURES_SCHEMA,
    )
