"""Invariant tests for the S2 and H3-style cell kernels (SURVEY.md §5.3)."""

import numpy as np
import pytest

from gjspark.functions import h3 as h3x, s2

rng = np.random.default_rng(42)
LAT = rng.uniform(-85, 85, 5000)
LNG = rng.uniform(-180, 180, 5000)


class TestS2:
    def test_center_roundtrip(self):
        for level in (10, 16, 20):
            c = s2.s2_cell(LAT, LNG, level)
            clat, clng = s2.s2_cell_center(c, level)
            assert (s2.s2_cell(clat, clng, level) == c).all()

    def test_parent_containment(self):
        c16 = s2.s2_cell(LAT, LNG, 16)
        c10 = s2.s2_cell(LAT, LNG, 10)
        assert (s2.s2_parent(c16, 10) == c10).all()

    def test_level_recovery(self):
        for level in (8, 16, 24):
            c = s2.s2_cell(LAT, LNG, level)
            assert (s2.s2_cell_level(c) == level).all()

    def test_nearby_points_share_cells_far_points_dont(self):
        c = s2.s2_cell(np.array([50.0, 50.0000001, 51.0]), np.array([8.0, 8.0000001, 9.0]), 12)
        assert c[0] == c[1] and c[0] != c[2]


class TestH3X:
    def test_center_roundtrip(self):
        for res in (7, 9, 12):
            c = h3x.h3_index(LAT, LNG, res)
            clat, clng = h3x.h3_center(c)
            assert (h3x.h3_index(clat, clng, res) == c).all()

    def test_hierarchy_mostly_nested(self):
        # aperture-7 hierarchies are not perfectly nested: each outer
        # child pokes outside its parent (the documented H3
        # childToParent caveat), putting ~7% of random points in the
        # wobble band where truncation-ancestor != direct coarse encode.
        # The exact invariant (child CENTER is inside the parent) is
        # tested in test_h3_canonical.py.
        c12 = h3x.h3_index(LAT, LNG, 12)
        c7 = h3x.h3_index(LAT, LNG, 7)
        agree = (h3x.h3_parent(c12, 7) == c7).mean()
        assert agree > 0.85

    def test_kring_sizes(self):
        c = h3x.h3_index(LAT[:50], LNG[:50], 8)
        for k in (1, 2, 3):
            kr = h3x.h3_kring(c, k)
            assert kr.shape == (50, 1 + 3 * k * (k + 1))
            assert (kr[:, 0] == c).all()
            # all distinct per row
            assert all(len(np.unique(row)) == kr.shape[1] for row in kr)

    def test_neighbor_symmetry(self):
        c = h3x.h3_index(LAT[:100], LNG[:100], 7)
        kr = h3x.h3_kring(c, 1)
        for row in range(100):
            for nb in kr[row, 1:]:
                assert c[row] in h3x.h3_kring(np.array([nb]), 1)[0]

    def test_resolution_recovery(self):
        for res in (7, 10, 12):
            assert (h3x.h3_resolution(h3x.h3_index(LAT, LNG, res)) == res).all()

    def test_res_monotone_cell_size(self):
        prev = None
        for res in range(7, 13):
            n = len(np.unique(h3x.h3_index(LAT, LNG, res)))
            if prev is not None:
                assert n >= prev
            prev = n

    def test_out_of_range_res(self):
        with pytest.raises(ValueError):
            h3x.h3_index(LAT[:1], LNG[:1], 16)
