"""find-or-create / deep-merge / keepLocations / validator tests
(reference semantics, SURVEY §5.2)."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from gjspark.operators import validators as V
from gjspark.operators.upsert import (
    AmbiguousMatchError,
    assert_unambiguous,
    deep_merge,
    find_or_create,
    merge_location_links,
)


class TestDeepMerge:
    # rule matrix from FrostUtils.java:727-765
    def test_source_wins_on_conflict(self):
        assert deep_merge({"a": 1}, {"a": 2}) == {"a": 2}

    def test_empty_never_overwrites(self):
        assert deep_merge({"a": 1}, {"a": None}) == {"a": 1}
        assert deep_merge({"a": 1}, {"a": ""}) == {"a": 1}

    def test_new_keys_added(self):
        assert deep_merge({"a": 1}, {"b": 2}) == {"a": 1, "b": 2}

    def test_nested_recursion(self):
        t = {"m": {"x": 1, "y": 2}}
        s = {"m": {"y": 3, "z": 4}}
        assert deep_merge(t, s) == {"m": {"x": 1, "y": 3, "z": 4}}

    def test_depth_cap(self):
        t = {"a": {"b": {"c": {"old": 1}}}}
        s = {"a": {"b": {"c": {"new": 2}}}}
        # depth 0: dicts are scalars -> source replaces wholesale
        assert deep_merge(t, s, max_depth=0) == s
        assert deep_merge(t, s, max_depth=10) == {
            "a": {"b": {"c": {"old": 1, "new": 2}}}
        }

    def test_type_conflict_source_wins(self):
        assert deep_merge({"a": {"x": 1}}, {"a": 5}) == {"a": 5}


@pytest.fixture()
def entities(spark):
    rows = [
        ("K1", "Name1", "D1", json.dumps({"p": "1"}), None),  # matches, equal
        ("K2", "Name2-new", "D2", json.dumps({"p": "2"}), None),  # matches, diff
        ("K3", "Name3", "D3", json.dumps({"p": "3"}), None),  # absent
    ]
    return spark.createDataFrame(
        rows, "cache_key string, name string, description string, "
        "properties_json string, geometry_json string"
    )


@pytest.fixture()
def snapshot(spark):
    rows = [
        ("id-1", "K1", "Name1", "D1", json.dumps({"p": "1"}), None),
        ("id-2", "K2", "Name2", "D2", json.dumps({"p": "2", "q": "z"}), None),
    ]
    return spark.createDataFrame(
        rows, "location_id string, cache_key string, name string, "
        "description string, properties_json string, geometry_json string"
    )


class TestFindOrCreate:
    def test_empty_snapshot_all_create(self, entities):
        out = find_or_create(entities, None, "Location").collect()
        assert all(r["op"] == "create" for r in out)
        ids = {r["entity_id"] for r in out}
        assert len(ids) == 3 and all(i.startswith("location-") for i in ids)

    def test_deterministic_ids(self, entities):
        a = {r["cache_key"]: r["entity_id"] for r in find_or_create(entities, None, "Location").collect()}
        b = {r["cache_key"]: r["entity_id"] for r in find_or_create(entities, None, "Location").collect()}
        assert a == b

    def test_matched_new_split(self, entities, snapshot):
        out = {r["cache_key"]: r for r in find_or_create(entities, snapshot, "Location").collect()}
        assert out["K1"]["op"] == "noop" and out["K1"]["entity_id"] == "id-1"
        assert out["K2"]["op"] == "update" and out["K2"]["entity_id"] == "id-2"
        # deep merge kept the snapshot-only key q
        assert json.loads(out["K2"]["properties_json"]) == {"p": "2", "q": "z"}
        assert out["K3"]["op"] == "create"

    def test_ambiguity_fail_fast(self, spark, entities, snapshot):
        dup = snapshot.union(
            spark.createDataFrame(
                [("id-9", "K1", "o", "o", None, None)], snapshot.schema
            )
        )
        with pytest.raises(AmbiguousMatchError):
            find_or_create(entities, dup, "Location")

    def test_assert_unambiguous_ok(self, snapshot):
        assert_unambiguous(snapshot)  # should not raise


class TestKeepLocations:
    def test_union_vs_replace(self, spark):
        df = spark.createDataFrame(
            [("t1", ["L2", "L1"], ["L3", "L1"])],
            "thing_id string, location_ids array<string>, "
            "snap_location_ids array<string>",
        )
        keep = merge_location_links(df, keep_locations=True).collect()[0]
        assert keep["location_ids_merged"] == ["L1", "L2", "L3"]
        assert keep["links_changed"]
        repl = merge_location_links(df, keep_locations=False).collect()[0]
        assert repl["location_ids_merged"] == ["L1", "L2"]


@pytest.fixture()
def obs(spark):
    t = dt.datetime(2024, 3, 1)
    rows = [
        ("o1", "ds1", t, None, "1", "{}"),
        ("o2", "ds1", t + dt.timedelta(hours=2), None, "2", "{}"),
        ("o3", "ds2", t, None, "3", '{"q":"1"}'),
    ]
    return spark.createDataFrame(
        rows, "obs_id string, ds_key string, t_start timestamp, "
        "t_end timestamp, result string, params_json string"
    )


@pytest.fixture()
def existing(spark):
    t = dt.datetime(2024, 3, 1)
    rows = [
        ("e1", "ds1", t + dt.timedelta(hours=1), None, "9", "{}"),
        ("e2", "ds2", t, None, "3", '{"q":"1"}'),
    ]
    return spark.createDataFrame(
        rows, "obs_id string, ds_key string, t_start timestamp, "
        "t_end timestamp, result string, params_json string"
    )


class TestValidators:
    def test_newer(self, obs, existing):
        got = {r["obs_id"] for r in V.validator_newer(obs, existing).collect()}
        # ds1 latest = t+1h -> only o2 passes; ds2 latest = t -> o3 equal, drop
        assert got == {"o2"}

    def test_by_phen_time_drop(self, obs, existing):
        got = {r["obs_id"] for r in V.validator_by_phen_time(obs, existing).collect()}
        assert got == {"o1", "o2"}  # o3 collides with e2

    def test_by_phen_time_update(self, spark, obs, existing):
        # make o3's result differ -> update with existing id
        obs2 = obs.withColumn(
            "result", F.when(F.col("obs_id") == "o3", "33").otherwise(F.col("result"))
        )
        rows = {r["obs_id"]: r for r in V.validator_by_phen_time(obs2, existing, update=True).collect()}
        assert rows["e2"]["op"] == "update"
        assert rows["o1"]["op"] == "create"

    def test_by_parameter(self, obs, existing):
        got = {r["obs_id"] for r in V.validator_by_parameter(obs, existing).collect()}
        # ds1 params {} exists -> o1, o2 dropped; ds2 {"q":"1"} exists -> o3 dropped
        assert got == set()
        got2 = {
            r["obs_id"]
            for r in V.validator_by_parameter(obs, existing, with_phen_time=True).collect()
        }
        assert got2 == {"o1", "o2"}  # times differ from e1's for ds1

    def test_before_after(self, obs):
        cut = dt.datetime(2024, 3, 1, 1)
        assert {r["obs_id"] for r in V.validator_before(obs, cut).collect()} == {"o1", "o3"}
        assert {r["obs_id"] for r in V.validator_after(obs, cut).collect()} == {"o2"}

    def test_multi_and_null(self, obs):
        out = V.validator_multi(
            obs,
            [
                V.validator_null,
                lambda d: V.validator_after(d, dt.datetime(2024, 2, 1)),
                lambda d: V.validator_before(d, dt.datetime(2024, 3, 1, 1)),
            ],
        )
        assert {r["obs_id"] for r in out.collect()} == {"o1", "o3"}

    def test_dedup_keep_latest(self, spark):
        t = dt.datetime(2024, 3, 1)
        rows = [
            ("a1", "ds1", t, None, "1", "{}"),
            ("a2", "ds1", t, None, "1b", "{}"),
            ("a3", "ds1", t + dt.timedelta(hours=1), None, "2", "{}"),
        ]
        df = spark.createDataFrame(
            rows, "obs_id string, ds_key string, t_start timestamp, "
            "t_end timestamp, result string, params_json string"
        )
        got = {r["obs_id"] for r in V.dedup_keep_latest(df).collect()}
        assert got == {"a2", "a3"}


def test_phenomenon_midpoint(spark):
    import datetime as dt
    from gjspark.operators.validators import phenomenon_midpoint, phenomenon_start

    t = dt.datetime(2024, 3, 1, 10, 0, 0)
    sub = dt.datetime(2024, 3, 1, 10, 0, 0, 250000)  # sub-second start
    df = spark.createDataFrame(
        [
            ("i", t, None),
            ("v", t, t + dt.timedelta(hours=2)),
            ("s", sub, sub + dt.timedelta(microseconds=500001)),
        ],
        "obs_id string, t_start timestamp, t_end timestamp",
    )
    out = {r["obs_id"]: r["mid"] for r in df.select("obs_id", phenomenon_midpoint().alias("mid")).collect()}
    assert out["i"] == t
    assert out["v"] == t + dt.timedelta(hours=1)
    # Instant-precise midpoint (reference: start + duration/2, truncated)
    assert out["s"] == sub + dt.timedelta(microseconds=250000)
    assert df.select(phenomenon_start()).collect()[0][0] == t


class TestEqualsFilterLookup:
    """P9: the reference's second probe — server-side equality filter
    (default `name eq ...`) for rows the cache key missed
    (FrostUtils.java:637-661, addOrCreateFilter :702-708)."""

    def _ents(self, spark, rows):
        return spark.createDataFrame(
            rows,
            "cache_key string, name string, description string, "
            "properties_json string, geometry_json string",
        )

    def test_second_probe_finds_by_name(self, spark):
        from gjspark.operators.upsert import find_or_create

        ents = self._ents(spark, [("NEW-KEY", "Berlin", "d", None, None)])
        snap = spark.createDataFrame(
            [("loc-9", "OLD-KEY", "Berlin", "d", None, None)],
            "location_id string, cache_key string, name string, "
            "description string, properties_json string, geometry_json string",
        )
        out = find_or_create(
            ents, snap, "Location", equals_col="name", check_ambiguous=False
        ).collect()[0]
        assert out["op"] == "noop"
        assert out["entity_id"] == "loc-9"
        # without the second probe the same row silently duplicates
        dup = find_or_create(ents, snap, "Location", check_ambiguous=False).collect()[0]
        assert dup["op"] == "create"

    def test_cache_hit_wins_over_name_match(self, spark):
        from gjspark.operators.upsert import find_or_create

        ents = self._ents(spark, [("K1", "SameName", "d", None, None)])
        snap = spark.createDataFrame(
            [
                ("loc-1", "K1", "SameName", "d", '{"a": 1}', None),
                ("loc-2", "K2", "SameName", "other", '{"b": 2}', None),
            ],
            "location_id string, cache_key string, name string, "
            "description string, properties_json string, geometry_json string",
        )
        rows = find_or_create(
            ents, snap, "Location", equals_col="name", check_ambiguous=False
        ).collect()
        # a cache-HIT row whose name matches >1 snapshot entities must NOT
        # fan out through the equals-probe join
        assert len(rows) == 1
        out = rows[0]
        assert out["entity_id"] == "loc-1"  # cache probe takes precedence
        assert '"a"' in out["properties_json"]

    def test_ambiguous_equality_match_fails_fast(self, spark):
        import pytest as _pytest

        from gjspark.operators.upsert import AmbiguousMatchError, find_or_create

        ents = self._ents(spark, [("MISS", "Dup", "d", None, None)])
        snap = spark.createDataFrame(
            [
                ("loc-1", "A", "Dup", "d", None, None),
                ("loc-2", "B", "Dup", "d", None, None),
            ],
            "location_id string, cache_key string, name string, "
            "description string, properties_json string, geometry_json string",
        )
        with _pytest.raises(AmbiguousMatchError, match="more than one entity"):
            find_or_create(
                ents, snap, "Location", equals_col="name", check_ambiguous=False
            ).collect()


class TestObsCache:
    """W2: windowed existing-obs fetch (validator/ObsCache.java:40-140)."""

    def test_range_prune_per_stream(self, spark):
        import datetime as dt

        from gjspark.operators.obs_cache import pruned_existing

        t = dt.datetime(2024, 3, 1)

        def mk(rows):
            return spark.createDataFrame(
                rows, "obs_id string, ds_key string, t_start timestamp"
            )

        existing = mk(
            [("e1", "ds1", t), ("e2", "ds1", t + dt.timedelta(hours=2)),
             ("e3", "ds2", t), ("e4", "ds3", t)]
        )
        incoming = mk(
            [("i1", "ds1", t + dt.timedelta(hours=1)),
             ("i2", "ds2", t - dt.timedelta(hours=1))]
        )
        got = {r["obs_id"] for r in pruned_existing(existing, incoming).collect()}
        # ds1: only e2 (>= t+1h); ds2: e3 (>= t-1h); ds3: nothing loaded
        assert got == {"e2", "e3"}

    def test_duplicate_cleanup(self, spark):
        import datetime as dt

        from gjspark.operators.obs_cache import duplicate_cleanup

        t = dt.datetime(2024, 3, 1)
        existing = spark.createDataFrame(
            [("a", "ds1", t), ("b", "ds1", t), ("c", "ds1", t + dt.timedelta(1))],
            "obs_id string, ds_key string, t_start timestamp",
        )
        kept, dele = duplicate_cleanup(existing)
        assert {r["obs_id"] for r in kept.collect()} == {"b", "c"}
        assert {r["obs_id"] for r in dele.collect()} == {"a"}


class TestPathAndContains:
    def test_set_by_path(self):
        from gjspark.operators.upsert import set_by_path

        d = {"a": {"b": 1}, "keep": "x"}
        out = set_by_path(d, "a/c/d", 7)
        assert out == {"a": {"b": 1, "c": {"d": 7}}, "keep": "x"}
        assert d == {"a": {"b": 1}, "keep": "x"}  # pure, input untouched
        assert set_by_path({}, "x", 1) == {"x": 1}
        # reference error semantics (CollectionsHelper.java:58-67)
        with pytest.raises(ValueError, match="is a list"):
            set_by_path({"a": [1]}, "a/b", 2)
        with pytest.raises(ValueError, match="not a map"):
            set_by_path({"a": 5}, "a/b", 2)

    def test_set_path_json_and_contains(self, spark):
        from gjspark.operators.upsert import entity_list_contains, set_path_json

        df = spark.createDataFrame(
            [('{"a": {"b": 1}}', "v1", ["L1", "L2"]), (None, "v2", ["L3"])],
            "props string, val string, links array<string>",
        )
        out = df.select(
            set_path_json(F.col("props"), "a/c", F.col("val")).alias("p"),
            entity_list_contains(F.col("links"), "L2").alias("has"),
        ).collect()
        assert out[0]["p"] == '{"a": {"b": 1, "c": "v1"}}'
        assert out[1]["p"] == '{"a": {"c": "v2"}}'
        assert out[0]["has"] is True and out[1]["has"] is False
