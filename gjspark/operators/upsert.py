"""find-or-create / update-if-changed upsert (reference J1/J2/J3, E4).

The reference's only join: probe a keyed cache, else query the server by
an equality filter, create when absent, diff-update when changed
(``utils/FrostUtils.java:637-693`` for Locations, identical structure x7
entity types). Spark translation: one broadcast left join of the rendered
entities against the entity snapshot on ``cache_key``; branch per row:

- no snapshot row            -> ``create`` with a deterministic id
                                ``xxhash64(entity_type, cache_key)``
                                (reruns/resumes stay stable)
- snapshot row, fields equal -> ``noop``
- snapshot row, any diff     -> ``update`` with merged fields

Parity details:
- ambiguity fail-fast: >1 snapshot row per key raises, like
  ``FrostUtils.java:646-648`` ("more than one entity found")
- deep property merge per ``addProperties`` (``FrostUtils.java:727-765``):
  null/empty source values never overwrite, nested maps recurse to
  ``max_depth``, scalar conflicts -> source wins; implemented as a
  vectorized pandas UDF over the two JSON columns (E4)
- geometry compared by canonical serialized JSON
  (``FrostUtils.java:678-687``)
- keepLocations (J3, ``FrostUtils.java:219-238``): a Thing's location
  link array is unioned when ``keep_locations`` else replaced when
  different.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


class AmbiguousMatchError(ValueError):
    pass


def deep_merge(target: dict, source: dict, max_depth: int = 10) -> dict:
    """Merge ``source`` into ``target`` with the reference's rules
    (``FrostUtils.java:727-765``): empty/None source values never
    overwrite; nested dicts recurse (depth-capped); otherwise source
    wins. Returns a new dict."""
    out = dict(target)
    for k, v in source.items():
        if v is None or v == "":
            continue
        if (
            max_depth > 0
            and isinstance(v, dict)
            and isinstance(out.get(k), dict)
        ):
            out[k] = deep_merge(out[k], v, max_depth - 1)
        elif out.get(k) != v:
            out[k] = v
    return out


@pandas_udf(T.StringType())
def deep_merge_json(target: pd.Series, source: pd.Series) -> pd.Series:
    def merge(t, s):
        if t is None and s is None:
            # both sides have no properties -> still no properties; a
            # synthesized "{}" here would flag a spurious update vs a
            # NULL snapshot (reference addProperties(null, null) = no-op)
            return None
        td = json.loads(t) if t else {}
        sd = json.loads(s) if s else {}
        return json.dumps(deep_merge(td, sd), sort_keys=True)

    return pd.Series([merge(t, s) for t, s in zip(target, source)])


def set_by_path(target: dict, path: str, value, sep: str = "/") -> dict:
    """P13 set-by-path (``utils/CollectionsHelper.java:40-68`` setOn):
    slash-split path, intermediate maps created on demand; a list or
    scalar in the middle of the path raises, like the reference. Returns
    a new dict (the reference mutates; column pipelines want purity)."""
    parts = [p for p in path.split(sep) if p != ""]
    if not parts:
        raise ValueError("empty path")
    out = dict(target)
    node = out
    for i, key in enumerate(parts[:-1]):
        sub = node.get(key)
        if sub is None:
            new = {}
        elif isinstance(sub, dict):
            new = dict(sub)
        elif isinstance(sub, list):
            raise ValueError(f"Item at path element {key} is a list.")
        else:
            raise ValueError(f"Element at path index {i} is not a map or list.")
        node[key] = new
        node = new
    node[parts[-1]] = value
    return out


def set_path_json(json_col, path: str, value_col):
    """Column form of :func:`set_by_path` over a JSON-object column."""

    @pandas_udf(T.StringType())
    def _set(js: pd.Series, vals: pd.Series) -> pd.Series:
        out = []
        for j, v in zip(js, vals):
            d = json.loads(j) if j else {}
            out.append(json.dumps(set_by_path(d, path, v), sort_keys=True))
        return pd.Series(out)

    return _set(json_col, value_col)


def entity_list_contains(links_col, entity_id) -> "F.Column":
    """E2 (``utils/FrostUtils.java:266-273`` entityListsContains):
    id-membership in an entity link array — the engine keeps entity
    lists as id arrays, so this is exactly ``array_contains``."""
    return F.array_contains(links_col, entity_id)


def assert_unambiguous(snapshot: DataFrame, key_col: str = "cache_key") -> None:
    """Fail-fast when any cache key maps to >1 snapshot entity."""
    dup = (
        snapshot.groupBy(key_col)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise AmbiguousMatchError(
            f"more than one entity found for key {dup[0][key_col]!r}"
        )


def find_or_create(
    entities: DataFrame,
    snapshot: DataFrame | None,
    entity_type: str,
    key_col: str = "cache_key",
    equals_col: str | None = None,
    check_ambiguous: bool = True,
) -> DataFrame:
    """-> entities + (entity_id, op) where op in ('create','update','noop').

    ``entities``: rendered rows with (cache_key, name, description,
    properties_json, geometry_json). ``snapshot``: existing server state
    with (location_id/..., cache_key, name, description, properties_json,
    geometry_json) or None for an empty server.

    Two probes, like the reference (P9): first the in-memory cache key
    (``key_col``); rows that miss are probed again by the equality-filter
    key ``equals_col`` — the reference's server-side OData filter, which
    defaults to ``name eq '<name>'`` when no filter is configured
    (``utils/FrostUtils.java:702-708`` addOrCreateFilter,
    ``:637-661`` findOrCreateLocation). Snapshots keyed differently than
    the template cache key are therefore still found instead of
    silently duplicated. >1 snapshot match for a probed equality key
    fails fast like ``FrostUtils.java:646-648``.
    """
    det_id = F.concat(
        F.lit(f"{entity_type.lower()}-"),
        F.lower(F.hex(F.xxhash64(F.lit(entity_type), F.col(key_col)))),
    )
    if snapshot is None:
        return entities.withColumn("entity_id", det_id).withColumn(
            "op", F.lit("create")
        )

    if check_ambiguous:
        assert_unambiguous(snapshot, key_col)

    snap_cols = {c for c in snapshot.columns}
    id_col = next(
        (c for c in snapshot.columns if c.endswith("_id")), "entity_id"
    )
    snap = snapshot.select(
        F.col(id_col).alias("__snap_id"),
        F.col(key_col),
        F.col("name").alias("__snap_name"),
        F.col("description").alias("__snap_desc"),
        (
            F.col("properties_json")
            if "properties_json" in snap_cols
            else F.lit(None).cast("string")
        ).alias("__snap_props"),
        (
            F.col("geometry_json")
            if "geometry_json" in snap_cols
            else F.lit(None).cast("string")
        ).alias("__snap_geom"),
    )
    joined = entities.join(F.broadcast(snap), key_col, "left")

    if equals_col is not None:
        # second probe (P9): rows missing in the cache-key join retry on
        # the equality-filter key. Fail fast when a probed key matches
        # more than one snapshot entity.
        snap2 = snapshot.select(
            F.col(id_col).alias("__s2_id"),
            F.col(equals_col).alias("__s2_key"),
            F.col("name").alias("__s2_name"),
            F.col("description").alias("__s2_desc"),
            (
                F.col("properties_json")
                if "properties_json" in snap_cols
                else F.lit(None).cast("string")
            ).alias("__s2_props"),
            (
                F.col("geometry_json")
                if "geometry_json" in snap_cols
                else F.lit(None).cast("string")
            ).alias("__s2_geom"),
        )
        probed = (
            joined.filter(F.col("__snap_id").isNull())
            .select(F.col(equals_col).alias("__s2_key"))
            .distinct()
        )
        # Restrict the probe-2 build side to keys that actually missed the
        # cache BEFORE joining. Otherwise a cache-HIT row whose equals key
        # matches >1 snapshot entities would fan out into duplicate output
        # rows (the dup fail-fast below only inspects probed keys, so the
        # fan-out would be silent).
        snap2 = snap2.join(F.broadcast(probed), "__s2_key")
        dup = (
            snap2.groupBy("__s2_key")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise AmbiguousMatchError(
                f"more than one entity matches filter "
                f"{equals_col} eq {dup[0]['__s2_key']!r}"
            )
        joined = joined.join(
            F.broadcast(snap2),
            joined[equals_col] == snap2["__s2_key"],
            "left",
        )
        # take probe-2 fields ONLY for rows the cache probe missed — a
        # cache hit with legitimately-NULL props must not inherit props
        # from a name-coincident entity
        cache_miss = F.col("__snap_id").isNull()
        for a, b in (
            ("__snap_name", "__s2_name"),
            ("__snap_desc", "__s2_desc"),
            ("__snap_props", "__s2_props"),
            ("__snap_geom", "__s2_geom"),
        ):
            joined = joined.withColumn(
                a, F.when(cache_miss, F.col(b)).otherwise(F.col(a))
            )
        joined = joined.withColumn(
            "__snap_id", F.coalesce(F.col("__snap_id"), F.col("__s2_id"))
        ).drop(
            "__s2_id", "__s2_key", "__s2_name", "__s2_desc", "__s2_props", "__s2_geom"
        )

    merged_props = deep_merge_json(F.col("__snap_props"), F.col("properties_json"))
    # changed when any tracked field differs (maybeUpdateLocation semantics:
    # name, description, merged properties, serialized geometry)
    geom_changed = ~(
        F.col("geometry_json").eqNullSafe(F.col("__snap_geom"))
    )
    changed = (
        (F.col("name") != F.col("__snap_name"))
        | (F.col("description") != F.col("__snap_desc"))
        | (~merged_props.eqNullSafe(F.col("__snap_props")))
        | geom_changed
    )
    out = (
        joined.withColumn(
            "op",
            F.when(F.col("__snap_id").isNull(), F.lit("create"))
            .when(changed, F.lit("update"))
            .otherwise(F.lit("noop")),
        )
        .withColumn(
            "entity_id",
            F.when(F.col("__snap_id").isNull(), det_id).otherwise(
                F.col("__snap_id")
            ),
        )
        .withColumn(
            # resulting server-side state: merged when an entity existed
            # (noop rows keep the snapshot's extra keys), rendered otherwise
            "properties_json",
            F.when(F.col("__snap_id").isNotNull(), merged_props).otherwise(
                F.col("properties_json")
            ),
        )
    )
    return out.drop("__snap_id", "__snap_name", "__snap_desc", "__snap_props", "__snap_geom")


def merge_location_links(
    things: DataFrame,
    links_col: str = "location_ids",
    snap_links_col: str = "snap_location_ids",
    keep_locations: bool = True,
) -> DataFrame:
    """J3 keepLocations: union link arrays when keeping, else replace
    (``FrostUtils.java:219-238``). Arrays are sorted for set semantics
    (E1 id-set equality)."""
    new_links = F.array_sort(F.col(links_col))
    old_links = F.array_sort(
        F.coalesce(F.col(snap_links_col), F.array().cast("array<string>"))
    )
    if keep_locations:
        merged = F.array_sort(F.array_union(old_links, new_links))
    else:
        merged = new_links
    return things.withColumn(
        "location_ids_merged", merged
    ).withColumn("links_changed", ~merged.eqNullSafe(old_links))
