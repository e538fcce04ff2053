"""Template projection engine (reference operator P1).

Parity target ``utils/TemplateUtils.java:37-113``: placeholders
``{path/to/field|default}`` are substituted against a Feature's
properties; rules reproduced exactly —

- path segments separated by ``/``; JSON-pointer escapes ``~0`` -> ``~``
  and ``~1`` -> ``/`` decoded per segment (``utils/JsonUtils.java:119-121``)
- numeric segments index into lists (``utils/JsonUtils.java:51-77``)
- a value that is missing, null, empty string, Map or List renders the
  default (empty string when no ``|default`` given)
  (``TemplateUtils.java:76-78``)
- rendered values escape ``"`` -> ``\\"`` and newline -> ``\\n`` so they
  can embed in JSON templates (``TemplateUtils.java:85-86``)
- ``N:`` path prefix forces decimal-separator normalization
  (``1.234,56`` -> ``1234.56``, ``utils/UnitConverter.java:107-120``)
- ``for_url`` mode renders OData constants: numbers bare, strings
  single-quoted with ``'`` doubled (``utils/FrostUtils.java:695-700``)

Compilation strategy (Spark-first): templates compile **once on the
driver**. Simple paths (plain keys, no list indices/escapes) become pure
Column expressions — ``concat(lit, coalesce(get_json_object(...)), ...)``
— fully JVM-side and codegen-friendly; anything else falls back to one
vectorized pandas UDF that runs the exact Python renderer per Arrow
batch. Both paths produce identical output on the conformance fixtures
(tested in ``tests/test_template.py``).
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# same placeholder grammar as TemplateUtils.java:37
_PLACEHOLDER = re.compile(r"\{([^|{}]+)(?:\|([^{}]*))?\}")
_SIMPLE_KEY = re.compile(r"^[A-Za-z0-9_ .-]+$")


def decode_segment(seg: str) -> str:
    """JSON-pointer unescape: ~1 -> '/', ~0 -> '~' (order matters)."""
    return seg.replace("~1", "/").replace("~0", "~")


def split_path(path: str) -> list[str]:
    return [decode_segment(s) for s in path.split("/")]


def normalize_decimal(s: str) -> str:
    """'1.234,56' -> '1234.56' (UnitConverter.java:107-120)."""
    if re.search(r",\d+$", s):
        return s.replace(".", "").replace(",", ".")
    return s


def get_from(obj, segments: list[str]):
    """Navigate dict/list by decoded segments (JsonUtils.java:51-77)."""
    cur = obj
    for seg in segments:
        if isinstance(cur, dict):
            if seg not in cur:
                return None
            cur = cur[seg]
        elif isinstance(cur, list):
            try:
                cur = cur[int(seg)]
            except (ValueError, IndexError):
                return None
        else:
            return None
    return cur


def _escape(value: str) -> str:
    return value.replace('"', '\\"').replace("\n", "\\n")


def _render_value(value, default: str, normalize: bool, for_url: bool) -> str:
    # Map/List/None/empty -> default (TemplateUtils.java:76-78)
    if value is None or isinstance(value, (dict, list)) or value == "":
        out = default
        is_string = True
    elif isinstance(value, bool):
        out = "true" if value else "false"
        is_string = False
    elif isinstance(value, (int, float)):
        out = json.dumps(value)
        is_string = False
    else:
        out = str(value)
        is_string = True
    if normalize:
        out = normalize_decimal(out)
        is_string = False
    if for_url:
        if is_string:
            return "'" + out.replace("'", "''") + "'"
        return out
    return _escape(out)


def render_template(template: str, props: dict, for_url: bool = False) -> str:
    """Exact Python renderer (drives goldens + the UDF fallback)."""

    def sub(m: re.Match) -> str:
        path, default = m.group(1), m.group(2) or ""
        normalize = path.startswith("N:")
        if normalize:
            path = path[2:]
        value = get_from(props, split_path(path))
        return _render_value(value, default, normalize, for_url)

    return _PLACEHOLDER.sub(sub, template)


def is_simple_template(template: str) -> bool:
    """Every placeholder path is plain keys (no escapes/indices/N:)."""
    for m in _PLACEHOLDER.finditer(template):
        path = m.group(1)
        if path.startswith("N:"):
            return False
        for seg in path.split("/"):
            if not _SIMPLE_KEY.match(seg) or seg.isdigit():
                return False
    return True


def template_column_native(template: str, props_col: Column) -> Column:
    """Compile a simple template to a pure Column expression (JVM-side)."""
    parts: list[Column] = []
    last = 0
    for m in _PLACEHOLDER.finditer(template):
        if m.start() > last:
            parts.append(F.lit(template[last : m.start()]))
        path, default = m.group(1), m.group(2) or ""
        json_path = "$." + ".".join(path.split("/"))
        raw = F.get_json_object(props_col, json_path)
        first = F.substring(raw, 1, 1)
        is_container = first.isin("{", "[")
        value = (
            F.when(raw.isNull() | (raw == "") | is_container, F.lit(default))
            .otherwise(raw)
        )
        escaped = F.regexp_replace(
            F.regexp_replace(value, '"', '\\\\"'), "\n", "\\\\n"
        )
        parts.append(escaped)
        last = m.end()
    if last < len(template):
        parts.append(F.lit(template[last:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def template_column_udf(template: str, props_col: Column, for_url: bool = False) -> Column:
    """Fallback: exact renderer in a vectorized pandas UDF."""

    @pandas_udf(T.StringType())
    def _render(props_json: pd.Series) -> pd.Series:
        return props_json.map(
            lambda s: render_template(template, json.loads(s) if s else {}, for_url)
        )

    return _render(props_col)


def template_column(template: str, props_col: Column, for_url: bool = False) -> Column:
    """Driver-side compile: native Column expr when possible, UDF otherwise."""
    if not for_url and is_simple_template(template):
        return template_column_native(template, props_col)
    return template_column_udf(template, props_col, for_url)
