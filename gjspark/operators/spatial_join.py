"""Spatial joins: point-in-polygon (J5) and cell-local kNN (J6).

The reference has no spatial joins — its only join is keyed find-or-create
(``utils/FrostUtils.java:637-661``); the north rule adds PIP and kNN over
the image table. Strategy (SURVEY.md §2.3):

PIP  = cell-equi prefilter + exact refine:
  1. cover every Feature polygon with H3-style cells at ``res``
     (distributed ``mapInPandas`` over the features DF — no driver
     geometry work, scales to arbitrarily many polygons),
  2. equi-join images on the cell column — Catalyst broadcasts the cover
     side when small (AQE converts at runtime otherwise) or shuffles on
     the cell key for the bucketed variant,
  3. refine candidate pairs with the vectorized ray-cast kernel in one
     pandas UDF (polygon WKB travels with the candidate row; parsed once
     per feature per batch).

The cover is a strict superset of cells containing any polygon point
(dense grid at <= 0.35 x cell inradius + bbox expansion), so step 3 never
misses a true match — verified against the brute-force numpy oracle in
``tests/test_spatial.py``.

kNN = sorted k-ring expansion + rank, with an exactness guarantee:
  iterate k in (0, 1, 2, 4, 8): explode the k-ring of each unmatched
  image's cell, equi-join against location cells, take the min-distance
  candidate (``row_number`` with deterministic (dist, location_id)
  tiebreak, W5); accept when the best distance is provably inside the
  ring-radius guarantee, else widen. Survivors fall back to a broadcast
  brute-force pass (exact), so results equal the oracle row-for-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gjspark.functions import geometry as G
from gjspark.functions import h3 as h3x

# ---------------------------------------------------------------------------
# Polygon cell cover
# ---------------------------------------------------------------------------

_COVER_SCHEMA = T.StructType(
    [
        T.StructField("cell", T.LongType()),
        T.StructField("feature_id", T.StringType()),
    ]
)


def _cover_cells_for_wkb(wkb: bytes, res: int) -> np.ndarray:
    """All res-cells whose region can intersect the polygon (superset)."""
    gtype, body = G.parse_wkb(wkb)
    polys = [body] if gtype == "Polygon" else body
    # grid spacing: cell inradius on the sphere, with margin for gnomonic
    # distortion; in degrees of latitude
    edge_m = h3x.h3_edge_length_m(res)
    step_deg = (edge_m * 0.866 * 0.35) / 111320.0
    cells = []
    for rings in polys:
        shell = rings[0]
        xmin, xmax = shell[:, 0].min(), shell[:, 0].max()
        ymin, ymax = shell[:, 1].min(), shell[:, 1].max()
        pad = 2 * edge_m / 111320.0
        lat_mid = np.clip((ymin + ymax) / 2, -89.0, 89.0)
        step_lon = step_deg / max(np.cos(np.radians(lat_mid)), 0.05)
        xs = np.arange(xmin - pad, xmax + pad + step_lon, step_lon)
        ys = np.arange(ymin - pad, ymax + pad + step_deg, step_deg)
        gx, gy = np.meshgrid(xs, ys)
        cells.append(np.unique(h3x.h3_index(gy.ravel(), gx.ravel(), res)))
        for ring in rings:  # ring vertices too (degenerate slivers)
            cells.append(np.unique(h3x.h3_index(ring[:, 1], ring[:, 0], res)))
    return np.unique(np.concatenate(cells))


def polygon_cover(features: DataFrame, res: int) -> DataFrame:
    """features(feature_id, geometry WKB) -> (cell, feature_id) cover rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cells = [], []
            for fid, wkb in zip(pdf["feature_id"], pdf["geometry"]):
                if wkb is None:
                    continue
                cc = _cover_cells_for_wkb(bytes(wkb), res)
                cells.append(cc)
                ids.extend([fid] * len(cc))
            if ids:
                yield pd.DataFrame(
                    {"cell": np.concatenate(cells), "feature_id": ids}
                )

    return (
        features.select("feature_id", "geometry", "geom_type")
        .filter(F.col("geom_type").isin("Polygon", "MultiPolygon"))
        # a FeatureCollection parses as one task per *file*; cover math is
        # per-polygon CPU, so spread polygons across the cluster first
        .repartition(32, "feature_id")
        .mapInPandas(gen, _COVER_SCHEMA)
    )


# ---------------------------------------------------------------------------
# PIP join
# ---------------------------------------------------------------------------

_PIP_REFINE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("feature_id", T.StringType()),
    ]
)


def pip_join(
    images: DataFrame,
    features: DataFrame,
    res: int = 7,
    cell_col: str | None = None,
    broadcast_cover: bool = True,
) -> DataFrame:
    """-> (image_id, feature_id) containment pairs.

    ``broadcast_cover=True``: cover+geometry side is broadcast (the common
    case — Feature sets are the dimension table, like the reference's
    entity caches). ``False``: shuffle equi-join on the cell key for huge
    polygon sets (bucketed variant); at 100 TB both sides pre-partitioned
    by cell avoid the shuffle entirely.
    """
    if cell_col is None:
        cell_col = f"h3_r{res}"
    cover = polygon_cover(features, res)

    if broadcast_cover:
        # r6: geometries ship ONCE as an sc.broadcast dict instead of
        # riding every candidate row through the join and the Arrow
        # boundary (each candidate previously carried its polygon's full
        # WKB — guide §2.3: move keys, not payloads). The features side
        # is the dimension table (same collect pattern as knn_join_map);
        # the cover join now carries only (cell, feature_id).
        spark = images.sparkSession
        geo_rows = features.select("feature_id", "geometry").collect()
        wkb_by_id = {
            r["feature_id"]: bytes(r["geometry"])
            for r in geo_rows
            if r["geometry"] is not None
        }
        bc = spark.sparkContext.broadcast(wkb_by_id)

        cand = images.select(
            "image_id", "lat", "lon", F.col(cell_col).alias("cell")
        ).join(F.broadcast(cover), "cell")

        def refine_bc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            wkbs = bc.value
            cache: dict[str, G.PolygonSet] = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                keep = np.zeros(len(pdf), dtype=bool)
                lon = pdf["lon"].to_numpy(dtype=float)
                lat = pdf["lat"].to_numpy(dtype=float)
                for fid, grp in pdf.groupby("feature_id", sort=False):
                    ps = cache.get(fid)
                    if ps is None:
                        ps = G.PolygonSet([fid], [wkbs[fid]])
                        cache[fid] = ps
                    pos = pdf.index.get_indexer(grp.index.to_numpy())
                    keep[pos] = ps.contains(lon[pos], lat[pos])[0]
                out = pdf.loc[keep, ["image_id", "feature_id"]]
                if len(out):
                    yield out

        return cand.mapInPandas(refine_bc, _PIP_REFINE_SCHEMA)

    # bucketed variant (huge polygon sets): no driver collect — geometry
    # travels with the cover rows through the shuffle equi-join
    geom = features.select("feature_id", "geometry")
    cover_geo = cover.join(geom, "feature_id")  # small x small

    cand = images.select("image_id", "lat", "lon", F.col(cell_col).alias("cell")).join(
        cover_geo, "cell"
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, G.PolygonSet] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            lon = pdf["lon"].to_numpy(dtype=float)
            lat = pdf["lat"].to_numpy(dtype=float)
            for fid, grp in pdf.groupby("feature_id", sort=False):
                ps = cache.get(fid)
                if ps is None:
                    ps = G.PolygonSet([fid], [bytes(grp["geometry"].iloc[0])])
                    cache[fid] = ps
                idx = grp.index.to_numpy()
                pos = pdf.index.get_indexer(idx)
                mask = ps.contains(lon[pos], lat[pos])[0]
                keep[pos] = mask
            out = pdf.loc[keep, ["image_id", "feature_id"]]
            if len(out):
                yield out

    return cand.mapInPandas(refine, _PIP_REFINE_SCHEMA)


# ---------------------------------------------------------------------------
# kNN join
# ---------------------------------------------------------------------------


def _choose_knn_res(loc_lat: np.ndarray, loc_lon: np.ndarray) -> int:
    """Pick the ring resolution from location spacing: cell inradius ~=
    median nearest-neighbor distance of a location sample, so the k=1 ring
    already contains the nearest location for the typical point."""
    m = len(loc_lat)
    if m < 2:
        return 3
    idx = np.arange(m) if m <= 2000 else np.linspace(0, m - 1, 2000).astype(int)
    la, lo = loc_lat[idx], loc_lon[idx]
    nn = np.full(len(idx), np.inf)
    for j in range(len(idx)):
        d = G.haversine_m(la, lo, la[j], lo[j])
        d[j] = np.inf
        nn[j] = d.min()
    target = np.median(nn)
    for res in range(0, h3x.MAX_RES + 1):
        if 0.866 * h3x.h3_edge_length_m(res) < target:
            return max(res - 1, 0)
    return h3x.MAX_RES


def knn_join_map(
    images: DataFrame,
    locations: DataFrame,
    res: int | None = None,
    k_schedule: tuple[int, ...] = (0, 1, 2, 4, 8),
) -> DataFrame:
    """Map-only cell-local kNN: sorted k-ring expansion executed inside one
    ``mapInPandas`` pass against a broadcast cell->locations index.

    The default kNN path. Locations are the dimension side (broadcast —
    exactly the reference's entity-cache pattern); each Arrow batch:

    1. index query points at ``res`` and group by cell,
    2. per distinct cell, expand rings k = 0, 1, 2, 4, 8 gathering
       candidate locations from the broadcast index,
    3. accept the running best at distance d iff d <= k*inradius*0.8 AND
       d <= face-boundary margin (rings never cross icosahedron faces),
    4. whatever stays unprovable gets an exact brute-force pass against
       the full location array (vectorized, still in the same kernel).

    Zero shuffles => scales linearly with executors at any image count;
    output equals the brute-force oracle row-for-row (tested). For
    location sets too big to broadcast, use :func:`knn_join_cellwise`.
    """
    spark = images.sparkSession
    loc_rows = locations.select("location_id", "lat", "lon").collect()
    loc_ids = np.array([r["location_id"] for r in loc_rows])
    loc_lat = np.array([r["lat"] for r in loc_rows], dtype=float)
    loc_lon = np.array([r["lon"] for r in loc_rows], dtype=float)
    order = np.argsort(loc_ids)
    loc_ids, loc_lat, loc_lon = loc_ids[order], loc_lat[order], loc_lon[order]

    if res is None:
        res = _choose_knn_res(loc_lat, loc_lon)
    inradius_m = 0.866 * h3x.h3_edge_length_m(res)

    loc_cells = h3x.h3_index(loc_lat, loc_lon, res)
    cell_index: dict[int, np.ndarray] = {}
    for i, c in enumerate(loc_cells):
        cell_index.setdefault(int(c), []).append(i)
    cell_index = {c: np.array(v, dtype=np.int64) for c, v in cell_index.items()}
    bc = spark.sparkContext.broadcast(
        (loc_ids, loc_lat, loc_lon, cell_index, res, inradius_m, tuple(k_schedule))
    )

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("nearest_location_id", T.StringType()),
            T.StructField("dist_m", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, lat_b, lon_b, index_b, res_b, inr_b, ks = bc.value
        # per-cell ring-candidate cache: cells repeat heavily across
        # batches, and ring lookups are the kernel's only Python-side loop
        cand_cache: dict[tuple[int, int], np.ndarray] = {}

        def candidates(cell: int, k: int, ring_cells) -> np.ndarray:
            key = (cell, k)
            hit = cand_cache.get(key)
            if hit is None:
                found = [index_b[int(c)] for c in ring_cells if int(c) in index_b]
                hit = (
                    np.concatenate(found)
                    if found
                    else np.zeros(0, dtype=np.int64)
                )
                cand_cache[key] = hit
            return hit

        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            qla = pdf["lat"].to_numpy(dtype=float)
            qlo = pdf["lon"].to_numpy(dtype=float)
            cells = h3x.h3_index(qla, qlo, res_b)
            margin = h3x.face_boundary_margin_m(qla, qlo)
            best_d = np.full(n, np.inf)
            best_i = np.full(n, -1, dtype=np.int64)
            resolved = np.zeros(n, dtype=bool)
            uniq, inv = np.unique(cells, return_inverse=True)
            rings = {k: h3x.h3_kring(uniq, k) for k in ks}
            for g, cell in enumerate(uniq):
                rows = np.nonzero(inv == g)[0]
                seen_cand = 0
                for k in ks:
                    cand = candidates(int(cell), k, rings[k][g])
                    if len(cand) > seen_cand:
                        act = rows[~resolved[rows]]
                        if not len(act):
                            break
                        d = G.haversine_m(
                            qla[act, None], qlo[act, None],
                            lat_b[cand][None, :], lon_b[cand][None, :],
                        )
                        jmin = d.argmin(axis=1)
                        dmin = d[np.arange(len(act)), jmin]
                        upd = dmin < best_d[act]
                        best_d[act] = np.where(upd, dmin, best_d[act])
                        best_i[act] = np.where(upd, cand[jmin], best_i[act])
                        seen_cand = len(cand)
                    guarantee = k * inr_b * 0.8
                    ok = (
                        (best_d[rows] <= guarantee)
                        & (best_d[rows] <= margin[rows])
                        & (best_i[rows] >= 0)
                    )
                    resolved[rows] = resolved[rows] | ok
                    if resolved[rows].all():
                        break
            rest = np.nonzero(~resolved)[0]
            if len(rest):  # exact fallback, vectorized
                d = G.haversine_m(
                    qla[rest, None], qlo[rest, None],
                    lat_b[None, :], lon_b[None, :],
                )
                jmin = d.argmin(axis=1)
                best_i[rest] = jmin
                best_d[rest] = d[np.arange(len(rest)), jmin]
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "nearest_location_id": ids_b[best_i],
                    "dist_m": best_d,
                }
            )

    return images.select("image_id", "lat", "lon").mapInPandas(run, schema)


def knn_join(
    images: DataFrame,
    locations: DataFrame,
    res: int | None = None,
    k_schedule: tuple[int, ...] = (0, 1, 2, 4, 8),
) -> DataFrame:
    """Default kNN entry point: map-only broadcast ring expansion."""
    return knn_join_map(images, locations, res=res, k_schedule=k_schedule)


def knn_join_cellwise(
    images: DataFrame,
    locations: DataFrame,
    res: int | None = None,
    k_schedule: tuple[int, ...] = (1, 3),
) -> DataFrame:
    """images(image_id, lat, lon) x locations(location_id, lat, lon)
    -> (image_id, nearest_location_id, dist_m).

    Sorted k-ring expansion with *provable* accepts: a best candidate at
    distance d is the true nearest iff

        d <= guarantee(k) = k * inradius * 0.8   (planar ring bound with
                                                  gnomonic-distortion margin)
        AND d <= face_boundary_margin(point)     (rings never cross
                                                  icosahedron face edges)

    ``res`` defaults to an adaptive choice from location spacing so round
    k=1 resolves the vast majority. Rows that stay unprovable fall back to
    one exact broadcast brute-force pass — output equals the brute-force
    oracle row-for-row (tested), while at 10^12 scale only a sliver of
    rows pay the fallback.  Locations are the broadcast side (dimension
    table); a huge location set would instead use the bucketed cell join
    of :func:`pip_join` as the candidate generator.
    """
    spark = images.sparkSession

    loc_rows = locations.select("location_id", "lat", "lon").collect()
    loc_ids = [r["location_id"] for r in loc_rows]
    loc_lat = np.array([r["lat"] for r in loc_rows], dtype=float)
    loc_lon = np.array([r["lon"] for r in loc_rows], dtype=float)
    order = np.argsort(np.array(loc_ids))
    loc_ids = [loc_ids[i] for i in order]
    loc_lat, loc_lon = loc_lat[order], loc_lon[order]
    bc = spark.sparkContext.broadcast((loc_ids, loc_lat, loc_lon))

    if res is None:
        res = _choose_knn_res(loc_lat, loc_lon)
    inradius_m = 0.866 * h3x.h3_edge_length_m(res)

    loc_cell = (
        locations.select(
            F.col("location_id"),
            F.col("lat").alias("llat"),
            F.col("lon").alias("llon"),
        )
        .withColumn("cell", _h3_udf(res)(F.col("llat"), F.col("llon")))
    )

    pending = (
        images.select("image_id", "lat", "lon")
        .withColumn("cell0", _h3_udf(res)(F.col("lat"), F.col("lon")))
        .withColumn("margin_m", _face_margin_udf()(F.col("lat"), F.col("lon")))
    )
    resolved = []
    for k in k_schedule:
        guarantee_m = k * inradius_m * 0.8
        ring = pending.withColumn(
            "cell", F.explode(_kring_udf(res, k)(F.col("cell0")))
        )
        cand = ring.join(F.broadcast(loc_cell), "cell").withColumn(
            "dist_m",
            _haversine_col(F.col("lat"), F.col("lon"), F.col("llat"), F.col("llon")),
        )
        # top-1 per image via min(struct(dist, id)): partial-aggregates
        # map-side (no sort, no window shuffle of full candidate rows) and
        # the struct ordering gives the deterministic (dist, id) tiebreak
        ok = (
            cand.groupBy("image_id")
            .agg(
                F.min(F.struct("dist_m", "location_id")).alias("best"),
                F.first("margin_m").alias("margin_m"),
            )
            .select(
                "image_id",
                F.col("best.location_id").alias("location_id"),
                F.col("best.dist_m").alias("dist_m"),
                "margin_m",
            )
            .filter(
                (F.col("dist_m") <= F.lit(guarantee_m))
                & (F.col("dist_m") <= F.col("margin_m"))
            )
            .select("image_id", "location_id", "dist_m")
        )
        resolved.append(ok)
        pending = pending.join(
            ok.select("image_id"), "image_id", "left_anti"
        ).localCheckpoint(eager=False)

    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("location_id", T.StringType()),
            T.StructField("dist_m", T.DoubleType()),
        ]
    )

    def brute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, llat, llon = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            la = pdf["lat"].to_numpy(dtype=float)
            lo = pdf["lon"].to_numpy(dtype=float)
            best_d = np.full(len(pdf), np.inf)
            best_i = np.zeros(len(pdf), dtype=np.int64)
            for j in range(len(ids)):  # ids sorted -> first-min = min id tiebreak
                d = G.haversine_m(la, lo, llat[j], llon[j])
                upd = d < best_d
                best_d = np.where(upd, d, best_d)
                best_i = np.where(upd, j, best_i)
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "location_id": [ids[i] for i in best_i],
                    "dist_m": best_d,
                }
            )

    fallback = pending.select("image_id", "lat", "lon").mapInPandas(brute, schema)
    resolved.append(fallback)

    out = resolved[0]
    for df in resolved[1:]:
        out = out.unionByName(df)
    return out.withColumnRenamed("location_id", "nearest_location_id")


def _h3_udf(res: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.LongType())
    def _f(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            h3x.h3_index(lat.to_numpy(dtype=float), lon.to_numpy(dtype=float), res)
        )

    return _f


def _kring_udf(res: int, k: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.LongType()))
    def _f(cell: pd.Series) -> pd.Series:
        kr = h3x.h3_kring(cell.to_numpy(dtype=np.int64), k)
        return pd.Series(list(kr))

    return _f


def _face_margin_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def _f(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            h3x.face_boundary_margin_m(
                lat.to_numpy(dtype=float), lon.to_numpy(dtype=float)
            )
        )

    return _f


def _haversine_col(lat1, lon1, lat2, lon2):
    """Haversine in meters as native Column expressions (JVM-side, no UDF)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(rlat1) * F.cos(rlat2) * F.pow(
        F.sin(dlon / 2), 2
    )
    return 2 * F.lit(G.EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(h, F.lit(1.0))))
