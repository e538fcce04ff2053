"""CRS kernel vs the reference's golden unit test
(``src/test/java/.../UtilsTest.java:31-58``)."""

import numpy as np

from gjspark.functions.crs import (
    parse_crs,
    round_half_even,
    tm_forward,
    to_wgs84,
    epsg_is_latlon_axis_order,
)


def test_golden_25832():
    lon, lat = to_wgs84(np.array([350779.28125]), np.array([5815166.0]), 25832)
    assert round_half_even(lon, 6)[0] == 6.803341
    assert round_half_even(lat, 6)[0] == 52.466243


def test_urn_4326_passthrough_latlon_axis():
    epsg = parse_crs("urn:ogc:def:crs:EPSG::4326")
    assert epsg == 4326
    assert epsg_is_latlon_axis_order(epsg)
    x, y = to_wgs84(np.array([52.466243]), np.array([6.803341]), 4326)
    assert x[0] == 52.466243 and y[0] == 6.803341  # identity; caller flips axes


def test_roundtrip_accuracy():
    rng = np.random.default_rng(42)
    lon = rng.uniform(6.01, 11.99, 1000)
    lat = rng.uniform(47.0, 55.0, 1000)
    e, n = tm_forward(lon, lat, 9.0)
    lon2, lat2 = to_wgs84(e, n, 25832)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_parse_crs_forms():
    assert parse_crs("25832") == 25832
    assert parse_crs("EPSG:4326") == 4326
    assert parse_crs("") is None
    assert parse_crs(None) is None
    assert parse_crs("bogus") is None


def test_half_even_rounding():
    # banker's rounding == BigDecimal HALF_EVEN
    assert round_half_even(np.array([0.5]), 0)[0] == 0.0
    assert round_half_even(np.array([1.5]), 0)[0] == 2.0
    assert round_half_even(np.array([2.5]), 0)[0] == 2.0
    assert round_half_even(np.array([1.2345665]), 6)[0] == 1.234566


def test_per_feature_templated_crs(spark, tmp_path):
    """CreatorFeature.java:60-63: the CRS itself is a template rendered
    per feature ({path/to/field|default} placeholders)."""
    import json

    from gjspark.functions.crs import round_half_even, to_wgs84
    from gjspark.sources.geojson import read_feature_collection

    fc = {
        "type": "FeatureCollection",
        "features": [
            {  # projected via nested property
                "type": "Feature", "id": "p1",
                "geometry": {"type": "Point", "coordinates": [692000.0, 5336000.0]},
                "properties": {"meta": {"srid": "25832"}},
            },
            {  # missing property -> template default 4326 (passthrough)
                "type": "Feature", "id": "p2",
                "geometry": {"type": "Point", "coordinates": [10.5, 48.1]},
                "properties": {},
            },
        ],
    }
    f = tmp_path / "fc.geojson"
    f.write_text(json.dumps(fc))
    out = {
        r["feature_id"]: (r["lon"], r["lat"])
        for r in read_feature_collection(
            spark, str(f), crs_template="EPSG:{meta/srid|4326}"
        ).collect()
    }
    import numpy as np

    exp_lon, exp_lat = to_wgs84(np.array([692000.0]), np.array([5336000.0]), 25832)
    assert out["p1"] == (
        float(round_half_even(exp_lon)[0]), float(round_half_even(exp_lat)[0])
    )
    assert out["p2"] == (10.5, 48.1)
