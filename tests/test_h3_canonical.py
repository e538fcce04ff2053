"""Canonical H3 module validation (gjspark/functions/h3.py).

Anchors to PUBLIC test vectors (H3 quickstart cell ids, the published
res-0 pentagon id list), then verifies the grid's defining invariants:
encode/decode roundtrip at every resolution including pentagon regions,
cell counts 122/842, parent containment, grid-disk geometry, and that the
committed calibration cache equals a from-scratch derivation.
"""

import numpy as np
import pytest

from gjspark.functions import h3

RNG = np.random.default_rng(20260816)


def _rand_points(n):
    lat = np.degrees(np.arcsin(RNG.uniform(-1, 1, n)))
    lng = RNG.uniform(-180, 180, n)
    return lat, lng


def _u(cells):
    return cells.view(np.uint64)


class TestPublicVectors:
    def test_quickstart_res5(self):
        # h3geo.org quickstart: latLngToCell(37.3615593, -122.0553238, 5)
        c = h3.latlng_to_cell([37.3615593], [-122.0553238], 5)
        assert int(_u(c)[0]) == 0x85283473FFFFFFF

    def test_sf_res9(self):
        # the SF example used throughout the H3 docs
        c = h3.latlng_to_cell([37.7752702151959], [-122.418307270836], 9)
        assert int(_u(c)[0]) == 0x8928308280FFFFF

    def test_res0_pentagon_ids(self):
        # published getPentagons(0) output
        pents = np.nonzero(h3._IS_PENT)[0]
        pc = h3._BC_CENTERS[pents]
        plat = np.degrees(np.arcsin(pc[:, 2]))
        plng = np.degrees(np.arctan2(pc[:, 1], pc[:, 0]))
        ids = sorted(int(v) for v in _u(h3.latlng_to_cell(plat, plng, 0)))
        expected = sorted(
            [0x8009FFFFFFFFFFF, 0x801DFFFFFFFFFFF, 0x8031FFFFFFFFFFF,
             0x804DFFFFFFFFFFF, 0x8063FFFFFFFFFFF, 0x8075FFFFFFFFFFF,
             0x807FFFFFFFFFFFF, 0x8091FFFFFFFFFFF, 0x80A7FFFFFFFFFFF,
             0x80C3FFFFFFFFFFF, 0x80D7FFFFFFFFFFF, 0x80EBFFFFFFFFFFF]
        )
        assert ids == expected

    def test_parent_of_doc_cell(self):
        # 8928308280fffff's documented res-7/8 ancestry via bit truncation
        c = np.array([0x8928308280FFFFF], dtype=np.uint64).view(np.int64)
        p8 = h3.cell_to_parent(c, 8)
        p7 = h3.cell_to_parent(c, 7)
        assert h3.get_resolution(p8)[0] == 8
        assert h3.get_resolution(p7)[0] == 7
        # truncation only touches the res nibble + trailing digits
        assert (int(_u(p8)[0]) >> 45) & 0x7F == (int(_u(c)[0]) >> 45) & 0x7F


class TestRoundtrip:
    @pytest.mark.parametrize("res", [0, 1, 2, 3, 5, 7, 9, 12, 15])
    def test_global(self, res):
        lat, lng = _rand_points(30000)
        c = h3.latlng_to_cell(lat, lng, res)
        cla, cln = h3.cell_to_latlng(c)
        assert (h3.latlng_to_cell(cla, cln, res) == c).all()

    def test_cell_counts(self):
        lat, lng = _rand_points(150000)
        assert len(np.unique(h3.latlng_to_cell(lat, lng, 0))) == 122
        assert len(np.unique(h3.latlng_to_cell(lat, lng, 1))) == 842

    @pytest.mark.parametrize("res", [1, 3, 7, 12])
    def test_pentagon_regions(self, res):
        pents = np.nonzero(h3._IS_PENT)[0]
        pc = h3._BC_CENTERS[pents]
        plat = np.degrees(np.arcsin(pc[:, 2]))
        plng = np.degrees(np.arctan2(pc[:, 1], pc[:, 0]))
        la, ln = [], []
        for la0, ln0 in zip(plat, plng):
            for r_deg in (0.0005, 0.01, 0.3, 2.0, 8.0, 14.0):
                for a in np.linspace(0, 360, 37):
                    la.append(la0 + r_deg * np.cos(np.radians(a)))
                    ln.append(
                        ln0 + r_deg * np.sin(np.radians(a))
                        / max(np.cos(np.radians(la0)), 0.05)
                    )
        la = np.clip(np.array(la), -89.9999, 89.9999)
        ln = np.array(ln)
        c = h3.latlng_to_cell(la, ln, res)
        cla, cln = h3.cell_to_latlng(c)
        assert (h3.latlng_to_cell(cla, cln, res) == c).all()

    def test_parent_contains_child_center(self):
        lat, lng = _rand_points(20000)
        for res in (5, 9):
            c = h3.latlng_to_cell(lat, lng, res)
            cla, cln = h3.cell_to_latlng(c)
            par = h3.cell_to_parent(c, res - 1)
            assert (h3.latlng_to_cell(cla, cln, res - 1) == par).all()


class TestGridDisk:
    def test_shapes_and_distances(self):
        lat, lng = _rand_points(2000)
        c = np.unique(h3.latlng_to_cell(lat, lng, 7))
        pent = h3.is_pentagon(c)
        spacing = np.arctan(h3._RES0_U_GNOMONIC / 7**3.5)
        for k in (1, 2):
            d = h3.grid_disk(c, k)
            assert d.shape == (len(c), 1 + 3 * k * (k + 1))
            assert (d[:, 0] == c).all()
            la0, ln0 = h3.cell_to_latlng(d[:, 0])
            for col in range(1, d.shape[1]):
                lan, lnn = h3.cell_to_latlng(d[:, col])
                dd = h3._angdist(
                    np.radians(la0), np.radians(ln0),
                    np.radians(lan), np.radians(lnn),
                )
                ring = 1 if col < 7 else 2
                lim = (ring + 0.3) * 1.3 * spacing
                bad = dd > lim
                # pentagon neighborhoods may alias one step outward
                assert (~bad | pent).all() or (dd[bad] < (ring + 1.4) * 1.3 * spacing).all()

    def test_ring1_superset_of_true_neighbors(self):
        # every cell whose center is within 1.2 spacings must be in the
        # k=1 disk (no true neighbor missed)
        lat, lng = _rand_points(500)
        c = np.unique(h3.latlng_to_cell(lat, lng, 6))[:200]
        d1 = h3.grid_disk(c, 1)
        la0, ln0 = h3.cell_to_latlng(c)
        # candidate neighbors: cells of points sampled densely around each
        spacing_deg = np.degrees(np.arctan(h3._RES0_U_GNOMONIC / 7**3.0))
        for idx in range(0, len(c), 7):
            ring = set(int(v) for v in d1[idx])
            for a in np.linspace(0, 360, 24, endpoint=False):
                pla = la0[idx] + spacing_deg * np.cos(np.radians(a))
                pln = ln0[idx] + spacing_deg * np.sin(np.radians(a)) / max(
                    np.cos(np.radians(la0[idx])), 0.05
                )
                nb = int(h3.latlng_to_cell([np.clip(pla, -90, 90)], [pln], 6)[0])
                nla, nln = h3.cell_to_latlng(np.array([nb]))
                dd = h3._angdist(
                    np.radians(la0[idx]), np.radians(ln0[idx]),
                    np.radians(nla[0]), np.radians(nln[0]),
                )
                if dd < 1.2 * np.arctan(h3._RES0_U_GNOMONIC / 7**3.0):
                    assert nb in ring

    def test_symmetry(self):
        lat, lng = _rand_points(300)
        c = np.unique(h3.latlng_to_cell(lat, lng, 8))[:100]
        d1 = h3.grid_disk(c, 1)
        back = h3.grid_disk(np.unique(d1[:, 1:]), 1)
        backsets = {int(r[0]): set(int(v) for v in r) for r in back}
        for row in range(len(c)):
            for col in range(1, 7):
                assert int(d1[row, 0]) in backsets[int(d1[row, col])]


class TestDerivation:
    def test_cache_matches_fresh_derivation(self):
        # the committed npz must equal a from-scratch probe calibration
        rot_cached = h3._ROT_LUT.copy()
        kcw_cached = h3._K_CW.copy()
        bc2, rot2, _ = h3._build_lookup()
        assert np.array_equal(bc2, h3._BC_LUT)
        try:
            h3._ROT_LUT[:] = rot2
            h3._K_CW[:] = False
            h3._calibrate_ambiguous()
            assert np.array_equal(h3._ROT_LUT, rot_cached)
            assert np.array_equal(h3._K_CW, kcw_cached)
        finally:
            h3._ROT_LUT[:] = rot_cached
            h3._K_CW[:] = kcw_cached

    def test_validate_tables_passes(self):
        h3._validate_tables()

    def test_quantizer_assigns_nearest(self):
        x = RNG.uniform(-50, 50, 20000)
        y = RNG.uniform(-50, 50, 20000)
        i, j, k = h3._hex2d_to_ijk(x, y)
        cx, cy = h3._ijk_to_hex2d(i, j, k)
        assert np.hypot(cx - x, cy - y).max() <= 1 / np.sqrt(3) + 1e-9


class TestInvalidInputs:
    def test_nan_raises_by_default_naming_rows(self):
        with pytest.raises(ValueError, match=r"rows \[1\]"):
            h3.latlng_to_cell([37.0, float("nan")], [-122.0, -122.0], 9)

    def test_null_mode_emits_sentinel_and_keeps_good_rows(self):
        out = h3.latlng_to_cell(
            [float("nan"), 37.7752702151959257],
            [np.inf, -122.418307270836230],
            9,
            invalid="null",
        )
        assert out[0] == h3.H3_NULL == 0
        assert hex(_u(out)[1]) == "0x8928308280fffff"

    def test_null_mode_multi_res(self):
        m = h3.latlng_to_cells_multi(
            [np.inf, 10.0], [0.0, 20.0], (7, 9, 12), invalid="null"
        )
        good = h3.latlng_to_cells_multi([10.0], [20.0], (7, 9, 12))
        for r in (7, 9, 12):
            assert m[r][0] == 0
            assert m[r][1] == good[r][0]

    def test_null_mode_does_not_mutate_caller_array(self):
        lat = np.array([np.nan, 10.0])
        lng = np.array([0.0, 20.0])
        h3.latlng_to_cell(lat, lng, 9, invalid="null")
        assert np.isnan(lat[0])

    def test_bad_invalid_mode_rejected(self):
        with pytest.raises(ValueError, match="invalid="):
            h3.latlng_to_cell([np.nan], [0.0], 9, invalid="zap")


class TestTableCacheIntegrity:
    def test_corrupted_cache_with_valid_bc_lut_is_rejected(self, tmp_path):
        """A cache whose rot_lut disagrees with derived entries (or holds
        out-of-range values) must be rejected, not silently trusted."""
        import os
        from unittest import mock

        good_rot = h3._ROT_LUT.copy()
        good_kcw = h3._K_CW.copy()
        bad_rot = good_rot.copy()
        mapped = np.argwhere(h3._BC_LUT >= 0)
        f, i, j, k = mapped[0]
        bad_rot[f, i, j, k] = (good_rot[f, i, j, k] + 1) % 6
        cache = tmp_path / "tables.npz"
        np.savez(cache, bc_lut=h3._BC_LUT, rot_lut=bad_rot, k_cw=good_kcw)
        calls = {"n": 0}

        def fake_calibrate():
            calls["n"] += 1

        with mock.patch.object(h3, "_TABLE_CACHE", str(cache)), mock.patch.object(
            h3, "_calibrate_ambiguous", fake_calibrate
        ):
            h3._load_or_calibrate()
        assert calls["n"] == 1  # rejected -> recalibrated
        assert os.path.exists(cache)  # rewritten atomically
        z = np.load(cache)
        assert np.array_equal(z["rot_lut"], good_rot)
        assert np.array_equal(h3._ROT_LUT, good_rot)
        assert np.array_equal(h3._K_CW, good_kcw)

    def test_valid_cache_is_loaded_without_recalibration(self, tmp_path):
        from unittest import mock

        cache = tmp_path / "tables.npz"
        np.savez(cache, bc_lut=h3._BC_LUT, rot_lut=h3._ROT_LUT, k_cw=h3._K_CW)

        def boom():
            raise AssertionError("should not recalibrate on a valid cache")

        with mock.patch.object(h3, "_TABLE_CACHE", str(cache)), mock.patch.object(
            h3, "_calibrate_ambiguous", boom
        ):
            h3._load_or_calibrate()
