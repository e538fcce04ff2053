"""Golden conformance: the Spark preview/upsert pipeline must match a
driver-side pure-Python evaluation of the reference's documented
semantics, row-for-row (SURVEY.md §5.1) — the distributed analogue of
comparing against ``generateTestOutput`` (``GeoJsonConverter.java:139-160``).
"""

import json

import pandas as pd
from pyspark.sql import functions as F
import pytest

from gjspark.fixtures import generator as gen
from gjspark.operators.entities import nuts_config, preview
from gjspark.operators.template import render_template
from gjspark.operators.upsert import deep_merge, find_or_create
from gjspark.sources.csv_points import read_csv_points
from gjspark.sources.geojson import read_feature_collection


@pytest.fixture(scope="module")
def features(spark, fixtures_dir):
    return read_feature_collection(
        spark, f"{fixtures_dir}/features_nuts.geojson"
    ).cache()


@pytest.fixture(scope="module")
def preview_pdf(spark, features):
    return preview(features, nuts_config()).toPandas()


def _expected_previews():
    """Pure-Python reference evaluation over the same fixture."""
    feats = gen.make_features()
    cfgs = nuts_config()
    rows = []
    for idx, f in enumerate(feats):
        props = f["properties"]
        for cfg in cfgs:
            name = render_template(cfg.template_name, props)
            if not name.strip():
                continue
            desc = render_template(cfg.template_description, props)
            pj = render_template(cfg.template_properties, props)
            props_json = json.dumps(json.loads(pj), sort_keys=True)
            geometry_json = (
                json.dumps(gen.round_geometry(f["geometry"]), sort_keys=True)
                if cfg.with_geometry
                else None
            )
            rows.append(
                {
                    "feature_id": f["id"],
                    "feature_idx": idx,
                    "entity_type": cfg.entity_type,
                    "name": name,
                    "description": desc,
                    "properties_json": props_json,
                    "geometry_json": geometry_json,
                    "cache_key": render_template(cfg.template_cache_key, props),
                }
            )
    return pd.DataFrame(rows)


def test_preview_row_for_row(preview_pdf):
    exp = _expected_previews()
    got = preview_pdf.sort_values(["entity_type", "feature_id"]).reset_index(drop=True)
    exp = exp.sort_values(["entity_type", "feature_id"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for col in exp.columns:
        mism = got[col].fillna("~N~") != exp[col].fillna("~N~")
        assert not mism.any(), f"{col}: {got[col][mism].head(3).tolist()} != {exp[col][mism].head(3).tolist()}"


def test_preview_covers_edge_cases(preview_pdf):
    loc = preview_pdf[preview_pdf.entity_type == "Location"].set_index("feature_id")
    # quote/newline escaping (k % 40 == 3)
    assert '\\"' in loc.loc["NUTS-3", "name"] and "\\n" in loc.loc["NUTS-3", "name"]
    # missing NAME_LATN -> default (k % 40 == 4)
    assert loc.loc["NUTS-4", "description"] == "Area unknown"


def test_find_or_create_matches_python_oracle(spark, fixtures_dir, features):
    locs = preview(features, [nuts_config()[0]])
    full_snapshot = spark.read.parquet(f"{fixtures_dir}/entity_snapshot.parquet")
    # the fixture plants a duplicated key -> fail-fast must trip (J1)
    from gjspark.operators.upsert import AmbiguousMatchError

    with pytest.raises(AmbiguousMatchError):
        find_or_create(locs, full_snapshot, "Location")
    snapshot = full_snapshot.filter(F.col("cache_key") != "NUTS-AMBIG")
    got = {
        r["cache_key"]: r
        for r in find_or_create(locs, snapshot, "Location").collect()
    }

    # python oracle over the same inputs
    feats = gen.make_features()
    snap_rows = {r["cache_key"]: r for r in gen.make_entity_snapshot(feats)}
    cfg = nuts_config()[0]
    n_create = n_update = n_noop = 0
    for f in feats:
        props = f["properties"]
        key = render_template(cfg.template_cache_key, props)
        name = render_template(cfg.template_name, props)
        if not name.strip():
            continue
        desc = render_template(cfg.template_description, props)
        props_json = json.dumps(
            json.loads(render_template(cfg.template_properties, props)),
            sort_keys=True,
        )
        geometry_json = json.dumps(gen.round_geometry(f["geometry"]), sort_keys=True)
        r = got[key]
        s = snap_rows.get(key)
        if s is None:
            assert r["op"] == "create", key
            assert r["entity_id"].startswith("location-")
            n_create += 1
            continue
        merged = json.dumps(
            deep_merge(json.loads(s["properties_json"]), json.loads(props_json)),
            sort_keys=True,
        )
        changed = (
            name != s["name"]
            or desc != s["description"]
            or merged != s["properties_json"]
            or geometry_json != s["geometry_json"]
        )
        if changed:
            assert r["op"] == "update", key
            assert r["entity_id"] == s["location_id"]
            assert r["properties_json"] == merged
            n_update += 1
        else:
            assert r["op"] == "noop", key
            assert r["entity_id"] == s["location_id"]
            n_noop += 1
    # all three paths exercised
    assert n_create > 30 and n_update > 30 and n_noop > 30


def test_csv_source_golden(spark, fixtures_dir):
    df = read_csv_points(
        spark,
        f"{fixtures_dir}/points.csv",
        x_col="easting",
        y_col="northing",
        crs_col="crs",
    )
    pdf = df.toPandas()
    assert len(pdf) == 500
    assert (pdf["geom_type"] == "Point").all()
    # decimal-comma easting normalized and projected into the fixture box
    assert pdf["lon"].between(6.0, 12.5).all()
    assert pdf["lat"].between(47.0, 55.0).all()
    # properties carry all CSV columns
    p0 = json.loads(pdf.sort_values("feature_id").iloc[0]["properties"])
    assert set(p0) == {"name", "easting", "northing", "crs", "station_type", "value", "ts"}


def test_projected_points_golden_pair(spark, fixtures_dir):
    df = read_feature_collection(spark, f"{fixtures_dir}/features_points_25832.geojson")
    row = df.filter("feature_id = 'P-GOLDEN'").collect()[0]
    # UtilsTest.java:31-38 golden: (350779.28125, 5815166.0) -> 6.803341, 52.466243
    assert row["lon"] == 6.803341
    assert row["lat"] == 52.466243


def test_headerless_csv_positional_keys(spark, tmp_path):
    p = tmp_path / "nohdr.csv"
    p.write_text("A;350779,28125;5815166.0;25832\nB;350779,28125;5815166.0;25832\n")
    df = read_csv_points(
        spark, str(p), x_col="1", y_col="2", crs_col="3", header=False
    )
    pdf = df.toPandas()
    assert len(pdf) == 2
    props = json.loads(pdf.iloc[0]["properties"])
    assert set(props) == {"0", "1", "2", "3"}  # positional keys
    assert pdf.iloc[0]["lon"] == 6.803341


def test_csv_row_skip_is_per_file(spark, tmp_path):
    """rowSkip is per-file positional (CsvLoaderOptions.java:118): with
    multi-file input each file drops its own first N data rows — not the
    first N of the concatenated dataset."""
    from gjspark.sources.csv_points import read_csv_points

    for tag in ("a", "b"):
        (tmp_path / f"{tag}.csv").write_text(
            "name;easting;northing;crs\n"
            + "".join(
                f"{tag.upper()}{i};69{i}000.0;533{i}000.0;25832\n"
                for i in range(1, 4)
            )
        )
    out = read_csv_points(
        spark, str(tmp_path), x_col="easting", y_col="northing",
        crs_col="crs", row_skip=2,
    )
    ids = sorted(r["feature_id"] for r in out.collect())
    assert ids == ["A3", "B3"], ids


def test_csv_row_skip_survives_multi_split_files(spark, tmp_path):
    """Files larger than maxPartitionBytes would normally be read as
    several splits, breaking monotonically_increasing_id's within-file
    ordering. With row_skip active the reader switches to multiLine mode
    (unsplittable), so the per-file skip stays exact by construction."""
    from gjspark.sources.csv_points import read_csv_points

    n = 2000
    (tmp_path / "big.csv").write_text(
        "name;easting;northing;crs\n"
        + "".join(f"R{i:05d};691000.0;5331000.0;25832\n" for i in range(n))
    )
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
    try:
        out = read_csv_points(
            spark, str(tmp_path), x_col="easting", y_col="northing",
            crs_col="crs", row_skip=5,
        ).select("feature_id")
        ids = sorted(r["feature_id"] for r in out.collect())
        assert len(ids) == n - 5
        assert ids[0] == "R00005"  # exactly the first five rows dropped
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
