"""``hexcell``: hierarchical hexagonal cell index in pure numpy.

**NOT canonical H3.** Cell ids from this module do NOT interoperate with
libh3 / the published H3 id space — downstream systems expecting H3 ids
cannot join against them. The module was renamed from ``h3x`` to make
that explicit. What IS shared with H3 is the mathematical construction
(h3geo.org/docs/core-library/overview, public spec): icosahedral faces,
gnomonic face planes, aperture-7 hex lattices whose orientation rotates
by ``asin(sqrt(3/28)) ~= 19.107 deg`` per resolution, alternating
Class II/III grids. Resolutions 0..15 supported; the engine uses 7..12
per the north rule — the ``h3_r{res}`` column names denote this
H3-*style* resolution ladder, not canonical H3 ids.

Canonical H3 cell *values* (the 122-base-cell table + per-cell
orientations) cannot be validated in this sandbox (no h3 package, no
network for test vectors), so the id layout is our own documented
packing rather than H3's base-cell digit string:

    bits 62..59  resolution (4 bits)
    bits 58..54  icosahedron face 0..19 (5 bits)
    bits 53..27  axial i + OFFSET (27 bits)
    bits 26..0   axial j + OFFSET (27 bits)

Every property a cell-equi-join prefilter, k-ring kNN, or tiling rollup
needs (hierarchy, locality, ~uniform area, ring algebra) holds and is
invariant-tested; swapping in canonical ids in production is a drop-in
replacement of ``h3_index``/``h3_parent``/``h3_kring``.

All grid-algebra invariants of a true aperture-7 hierarchy hold and are
tested: k-ring sizes 1/7/19/37, neighbor symmetry, parent containment of
cell centers, center round-trip, ~7x child counts, monotone cell areas.

Not present in the reference repo (no spatial index; linear per-feature
loop at ``geojson/GeoJsonConverter.java:185-196``); required by
``BASELINE.json`` north rule for cell-equi-join prefilters.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Icosahedron geometry (derived, not a copied table): 20 face centers from
# the 12 vertices of a unit icosahedron built on the golden ratio.
# ---------------------------------------------------------------------------


def _icosahedron_faces():
    phi = (1 + np.sqrt(5.0)) / 2
    verts = []
    for a, b in [(1, phi), (-1, phi), (1, -phi), (-1, -phi)]:
        verts += [(0, a, b), (a, b, 0), (b, 0, a)]
    v = np.array(verts, dtype=np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # faces = triples of mutually-nearest vertices: enumerate all triples with
    # pairwise dot > 0.4 (icosahedron edge angle ~63.4 deg, cos ~0.447)
    faces = []
    n = len(v)
    for i in range(n):
        for j in range(i + 1, n):
            if v[i] @ v[j] < 0.4:
                continue
            for k in range(j + 1, n):
                if v[i] @ v[k] > 0.4 and v[j] @ v[k] > 0.4:
                    faces.append((i, j, k))
    assert len(faces) == 20, len(faces)
    centers = np.array([(v[a] + v[b] + v[c]) / 3.0 for a, b, c in faces])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    # stable face order: sort by (z, atan2(y, x)) rounded — deterministic
    key = np.lexsort(
        (np.round(np.arctan2(centers[:, 1], centers[:, 0]), 9), np.round(centers[:, 2], 9))
    )
    centers = centers[key]
    faces = [faces[k] for k in key]
    # inward-oriented great-circle normals of each face's 3 edges (used for
    # provable kNN accepts near face boundaries)
    edge_normals = []
    for (a, b, c), ctr in zip(faces, centers):
        ns = []
        for p, q in ((a, b), (b, c), (c, a)):
            nvec = np.cross(v[p], v[q])
            nvec /= np.linalg.norm(nvec)
            if nvec @ ctr < 0:
                nvec = -nvec
            ns.append(nvec)
        edge_normals.append(ns)
    global _FACE_EDGE_N
    _FACE_EDGE_N = np.array(edge_normals)  # (20, 3, 3)
    # local tangent axes per face (east = z-cross-c unless near pole)
    axes_e, axes_n = [], []
    for c in centers:
        ref = np.array([0.0, 0.0, 1.0])
        if abs(c @ ref) > 0.999:
            ref = np.array([1.0, 0.0, 0.0])
        e = np.cross(ref, c)
        e /= np.linalg.norm(e)
        nvec = np.cross(c, e)
        axes_e.append(e)
        axes_n.append(nvec)
    return centers, np.array(axes_e), np.array(axes_n)


_FACE_C, _FACE_E, _FACE_N = _icosahedron_faces()

# Aperture-7 geometry: each finer resolution shrinks edge length by sqrt(7)
# and rotates the lattice by asin(sqrt(3/28)) (public H3 constant).
_AP7_ROT = np.arcsin(np.sqrt(3.0 / 28.0))
_SQRT7 = np.sqrt(7.0)
# Res-0 hex circumradius on the gnomonic plane. Face inradius of the
# icosahedron gnomonic projection is ~0.42; 0.18 gives ~2500 res-0 cells
# globally (vs H3's 122) — a denser but equally hierarchical base grid.
_RES0_SIZE = 0.18
_OFFSET = 1 << 26  # center axial coords into unsigned 27-bit fields
_MASK27 = (1 << 27) - 1

MAX_RES = 15


def _lattice_basis(res: int) -> np.ndarray:
    """2x2 matrix whose columns are the axial basis vectors e_i, e_j of the
    res-``res`` hex lattice on the face plane."""
    size = _RES0_SIZE / (_SQRT7**res)
    ang = res * _AP7_ROT
    c, s = np.cos(ang), np.sin(ang)
    rot = np.array([[c, -s], [s, c]])
    # pointy-top axial basis scaled so hex circumradius == size
    e_i = np.array([np.sqrt(3.0), 0.0]) * size
    e_j = np.array([np.sqrt(3.0) / 2, 1.5]) * size
    return rot @ np.column_stack([e_i, e_j])


_BASIS = [_lattice_basis(r) for r in range(MAX_RES + 1)]
_BASIS_INV = [np.linalg.inv(b) for b in _BASIS]


def latlng_to_face_xy(lat_deg, lng_deg):
    """lat/lng -> (face idx, gnomonic x, gnomonic y). Vectorized."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    p = np.stack([np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)], 1)
    dots = p @ _FACE_C.T  # (n, 20)
    face = np.argmax(dots, axis=1)
    best = dots[np.arange(len(p)), face]
    # gnomonic projection onto tangent plane at face center
    scaled = p / best[:, None]
    rel = scaled - _FACE_C[face]
    x = np.einsum("nd,nd->n", rel, _FACE_E[face])
    y = np.einsum("nd,nd->n", rel, _FACE_N[face])
    return face.astype(np.int64), x, y


def face_xy_to_latlng(face, x, y):
    face = np.asarray(face, dtype=np.int64)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    p = _FACE_C[face] + x[:, None] * _FACE_E[face] + y[:, None] * _FACE_N[face]
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    lat = np.degrees(np.arcsin(np.clip(p[:, 2], -1, 1)))
    lng = np.degrees(np.arctan2(p[:, 1], p[:, 0]))
    return lat, lng


def _axial_round(fi: np.ndarray, fj: np.ndarray):
    """Cube-coordinate rounding of fractional axial coords (standard hex
    grid algorithm, Red Blob Games 'Hexagonal Grids' — public)."""
    fk = -fi - fj
    ri, rj, rk = np.round(fi), np.round(fj), np.round(fk)
    di, dj, dk = np.abs(ri - fi), np.abs(rj - fj), np.abs(rk - fk)
    fix_i = (di > dj) & (di > dk)
    fix_j = ~fix_i & (dj > dk)
    ri = np.where(fix_i, -rj - rk, ri)
    rj = np.where(fix_j, -ri - rk, rj)
    return ri.astype(np.int64), rj.astype(np.int64)


def _round_on_face(face, lat, lng, res: int):
    """Project lat/lng onto the *given* faces' planes and round to lattice."""
    p = np.stack(
        [
            np.cos(np.radians(lat)) * np.cos(np.radians(lng)),
            np.cos(np.radians(lat)) * np.sin(np.radians(lng)),
            np.sin(np.radians(lat)),
        ],
        1,
    )
    dots = np.einsum("nd,nd->n", p, _FACE_C[face])
    scaled = p / dots[:, None]
    rel = scaled - _FACE_C[face]
    x = np.einsum("nd,nd->n", rel, _FACE_E[face])
    y = np.einsum("nd,nd->n", rel, _FACE_N[face])
    inv = _BASIS_INV[res]
    return _axial_round(inv[0, 0] * x + inv[0, 1] * y, inv[1, 0] * x + inv[1, 1] * y)


def h3_index(lat_deg, lng_deg, res: int) -> np.ndarray:
    """lat/lng arrays -> int64 cell ids at resolution ``res``.

    Cells straddling icosahedron face edges are canonicalized to the face
    their own lattice center projects onto (fixed-point iteration, <=3
    rounds) so ``h3_index(h3_center(c)) == c`` holds everywhere and cell
    ownership is a pure function of the cell, never the query point.
    """
    if not (0 <= res <= MAX_RES):
        raise ValueError("res out of range")
    face, x, y = latlng_to_face_xy(lat_deg, lng_deg)
    inv = _BASIS_INV[res]
    fi = inv[0, 0] * x + inv[0, 1] * y
    fj = inv[1, 0] * x + inv[1, 1] * y
    i, j = _axial_round(fi, fj)
    b = _BASIS[res]
    for _ in range(3):
        cx = b[0, 0] * i + b[0, 1] * j
        cy = b[1, 0] * i + b[1, 1] * j
        clat, clng = face_xy_to_latlng(face, cx, cy)
        cface, _, _ = latlng_to_face_xy(clat, clng)
        moved = cface != face
        if not moved.any():
            break
        mi, mj = _round_on_face(cface[moved], clat[moved], clng[moved], res)
        face = np.where(moved, cface, face)
        i = np.where(moved, 0, i)
        j = np.where(moved, 0, j)
        i[moved] = mi
        j[moved] = mj
    return pack(res, face, i, j)


def pack(res, face, i, j) -> np.ndarray:
    i_u = (np.asarray(i, dtype=np.int64) + _OFFSET).astype(np.uint64)
    j_u = (np.asarray(j, dtype=np.int64) + _OFFSET).astype(np.uint64)
    out = (
        (np.uint64(res) << np.uint64(59))
        | (np.asarray(face).astype(np.uint64) << np.uint64(54))
        | (i_u << np.uint64(27))
        | j_u
    )
    return out.view(np.int64)


def unpack(cell):
    c = np.asarray(cell).view(np.uint64)
    res = ((c >> np.uint64(59)) & np.uint64(0xF)).astype(np.int64)
    face = ((c >> np.uint64(54)) & np.uint64(0x1F)).astype(np.int64)
    i = ((c >> np.uint64(27)) & np.uint64(_MASK27)).astype(np.int64) - _OFFSET
    j = (c & np.uint64(_MASK27)).astype(np.int64) - _OFFSET
    return res, face, i, j


def h3_resolution(cell) -> np.ndarray:
    return unpack(cell)[0]


def h3_center(cell) -> tuple[np.ndarray, np.ndarray]:
    """Cell -> (lat, lng) of its lattice center."""
    res, face, i, j = unpack(cell)
    lat = np.empty(len(np.atleast_1d(face)), dtype=np.float64)
    lng = np.empty_like(lat)
    resv = np.atleast_1d(res)
    for r in np.unique(resv):
        m = resv == r
        b = _BASIS[int(r)]
        x = b[0, 0] * i[m] + b[0, 1] * j[m]
        y = b[1, 0] * i[m] + b[1, 1] * j[m]
        lat[m], lng[m] = face_xy_to_latlng(np.atleast_1d(face)[m], x, y)
    return lat, lng


def h3_parent(cell, parent_res: int) -> np.ndarray:
    """Ancestor cell: index of this cell's center at the coarser res."""
    lat, lng = h3_center(cell)
    return h3_index(lat, lng, parent_res)


def h3_kring(cell: np.ndarray, k: int) -> np.ndarray:
    """All cells within grid distance k, per input cell.

    Returns shape ``(n, 1 + 3k(k+1))``, column 0 = the cell itself,
    remaining columns sorted by ring. Same-face lattice neighbors only:
    across icosahedron face boundaries the ring is geometrically truncated
    (callers that need exactness — kNN — use the ring-radius guarantee plus
    a brute-force fallback, see ``operators/spatial_join.py``).
    """
    res, face, i, j = unpack(cell)
    offs = [(di, dj) for di in range(-k, k + 1) for dj in range(-k, k + 1)
            if max(abs(di), abs(dj), abs(di + dj)) <= k]
    # sort by ring (hex distance), center first — kNN expansion relies on it
    offs.sort(key=lambda o: (max(abs(o[0]), abs(o[1]), abs(o[0] + o[1])), o))
    offs = np.array(offs, dtype=np.int64)  # (m, 2)
    i_all = i[:, None] + offs[None, :, 0]
    j_all = j[:, None] + offs[None, :, 1]
    res_b = np.broadcast_to(res[:, None], i_all.shape)
    face_b = np.broadcast_to(face[:, None], i_all.shape)
    return pack(res_b, face_b, i_all, j_all)


def face_boundary_margin_m(lat_deg, lng_deg) -> np.ndarray:
    """Great-circle distance (meters) from each point to the nearest edge
    of its own icosahedron face. Lattice k-rings never cross face edges, so
    a kNN accept is only provable when the best distance also stays inside
    this margin (see ``operators/spatial_join.knn_join``)."""
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    p = np.stack([np.cos(lat) * np.cos(lng), np.cos(lat) * np.sin(lng), np.sin(lat)], 1)
    face = np.argmax(p @ _FACE_C.T, axis=1)
    normals = _FACE_EDGE_N[face]  # (n, 3, 3)
    dots = np.einsum("nd,ned->ne", p, normals)
    ang = np.arcsin(np.clip(dots, 0, 1)).min(axis=1)
    return ang * 6371007.2


def h3_edge_length_m(res: int) -> float:
    """Approximate great-circle hex circumradius at ``res`` in meters."""
    R = 6371007.2
    return _RES0_SIZE / (_SQRT7**res) * R


def cols_for_point(lat_deg, lng_deg, resolutions=(7, 8, 9, 10, 11, 12)):
    """Convenience: dict res -> int64 cell array (one kernel call per res)."""
    return {r: h3_index(lat_deg, lng_deg, r) for r in resolutions}
