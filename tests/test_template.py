"""Template engine conformance (TemplateUtils.java semantics, SURVEY §5.2)."""

import json

import pytest
from pyspark.sql import functions as F

from gjspark.operators.template import (
    is_simple_template,
    normalize_decimal,
    render_template,
    template_column,
    template_column_native,
    template_column_udf,
)

PROPS = {
    "NUTS_ID": "DE111",
    "NUTS_NAME": 'Stutt"gart',
    "LEVL_CODE": 3,
    "empty": "",
    "nested": {"a": {"b": 42}},
    "arr": [7, "x"],
    "weird~key": "tilde",
    "weird/key": "slash",
    "multi\nline": "nl",
    "num_de": "1.234,56",
    "flag": True,
}


class TestPythonRenderer:
    def test_basic_and_default(self):
        assert render_template("id={NUTS_ID}", PROPS) == "id=DE111"
        assert render_template("x={MISSING|dflt}", PROPS) == "x=dflt"
        assert render_template("x={MISSING}", PROPS) == "x="

    def test_empty_map_list_render_default(self):
        # TemplateUtils.java:76-78: empty string, Map, List -> default
        assert render_template("{empty|D}", PROPS) == "D"
        assert render_template("{nested|D}", PROPS) == "D"
        assert render_template("{arr|D}", PROPS) == "D"

    def test_nested_path_and_index(self):
        assert render_template("{nested/a/b}", PROPS) == "42"
        assert render_template("{arr/0}-{arr/1}", PROPS) == "7-x"
        assert render_template("{arr/9|oob}", PROPS) == "oob"

    def test_pointer_escapes(self):
        # ~0 -> ~, ~1 -> / (JsonUtils.java:119-121)
        assert render_template("{weird~0key}", PROPS) == "tilde"
        assert render_template("{weird~1key}", PROPS) == "slash"

    def test_quote_newline_escaping(self):
        assert render_template("{NUTS_NAME}", PROPS) == 'Stutt\\"gart'
        assert render_template("{k}", {"k": 'a\nb"c'}) == 'a\\nb\\"c'

    def test_numbers_and_bools(self):
        assert render_template("{LEVL_CODE}", PROPS) == "3"
        assert render_template("{flag}", PROPS) == "true"

    def test_n_prefix_decimal_normalization(self):
        assert render_template("{N:num_de}", PROPS) == "1234.56"
        assert normalize_decimal("1.234,56") == "1234.56"
        assert normalize_decimal("1234.56") == "1234.56"

    def test_for_url_odata_constants(self):
        # strings single-quoted, quotes doubled; numbers bare
        # (FrostUtils.java:695-700)
        assert render_template("name eq {k}", {"k": "O'Hara"}, for_url=True) == (
            "name eq 'O''Hara'"
        )
        assert render_template("v eq {LEVL_CODE}", PROPS, for_url=True) == "v eq 3"


class TestSparkParity:
    @pytest.fixture(scope="class")
    def props_df(self, spark):
        return spark.createDataFrame(
            [(json.dumps(PROPS),)], "properties string"
        )

    @pytest.mark.parametrize(
        "tmpl",
        [
            "id={NUTS_ID}",
            "x={MISSING|dflt}",
            "{empty|D}",
            "{nested|D}",
            "{NUTS_NAME}",
            "name: {NUTS_NAME}, lvl {LEVL_CODE|0}",
        ],
    )
    def test_native_matches_python(self, props_df, tmpl):
        assert is_simple_template(tmpl)
        got = props_df.select(
            template_column_native(tmpl, F.col("properties")).alias("r")
        ).collect()[0]["r"]
        assert got == render_template(tmpl, PROPS)

    @pytest.mark.parametrize(
        "tmpl",
        [
            "{nested/a/b}",
            "{arr/0}-{arr/1}",
            "{weird~0key}/{weird~1key}",
            "{N:num_de}",
        ],
    )
    def test_udf_matches_python(self, props_df, tmpl):
        got = props_df.select(
            template_column_udf(tmpl, F.col("properties")).alias("r")
        ).collect()[0]["r"]
        assert got == render_template(tmpl, PROPS)

    def test_dispatch(self, props_df):
        for tmpl in ["id={NUTS_ID}", "{nested/a/b}", "{N:num_de}"]:
            got = props_df.select(
                template_column(tmpl, F.col("properties")).alias("r")
            ).collect()[0]["r"]
            assert got == render_template(tmpl, PROPS)
