"""Coordinate-reference-system kernels in pure numpy.

Behavioral parity target: the reference converts per-vertex from a source
CRS to EPSG:4326 using geotools and rounds coordinates with
``BigDecimal.setScale(scale, HALF_EVEN)`` (reference
``utils/FrostUtils.java:915-1010``; golden values in
``src/test/java/.../UtilsTest.java:31-48``:
EPSG:25832 ``(350779.28125, 5815166.0) -> (6.803341, 52.466243)`` at
scale 6, and URN-form EPSG:4326 passthrough with LAT,LON axis order).

We implement the transverse-Mercator inverse/forward with the Karney–Krüger
series (order n^6, good to nanometres — public formulation, see Karney 2011
"Transverse Mercator with an accuracy of a few nanometers"), specialized to
the EPSG:258xx (ETRS89 / UTM zone xx, GRS80) family plus EPSG:326xx/327xx
(WGS84 UTM).  All functions take/return numpy arrays.
"""

from __future__ import annotations

import re

import numpy as np

# GRS80 ellipsoid (ETRS89, EPSG:258xx); WGS84 differs only in 1/f at the
# 1e-9 level which is far below the 1e-6 deg gate.
_ELLIPSOIDS = {
    "GRS80": (6378137.0, 1.0 / 298.257222101),
    "WGS84": (6378137.0, 1.0 / 298.257223563),
}


def _tm_constants(a: float, f: float):
    n = f / (2.0 - f)
    n2, n3, n4, n5, n6 = n**2, n**3, n**4, n**5, n**6
    # Rectifying radius
    A = a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    # Forward (alpha) and inverse (beta) series coefficients, order n^6.
    alpha = np.array(
        [
            n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
            13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
            61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
            49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
            34729 * n5 / 80640 - 3418889 * n6 / 1995840,
            212378941 * n6 / 319334400,
        ]
    )
    beta = np.array(
        [
            n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
            n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
            17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
            4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
            4583 * n5 / 161280 - 108847 * n6 / 3991680,
            20648693 * n6 / 638668800,
        ]
    )
    e = np.sqrt(f * (2 - f))
    return A, alpha, beta, e


_K0 = 0.9996
_FALSE_E = 500000.0


def tm_inverse(
    easting: np.ndarray,
    northing: np.ndarray,
    lon0_deg: float,
    ellipsoid: str = "GRS80",
    northern: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """UTM-style transverse-Mercator inverse -> (lon_deg, lat_deg)."""
    a, f = _ELLIPSOIDS[ellipsoid]
    A, _alpha, beta, e = _tm_constants(a, f)
    x = (np.asarray(easting, dtype=np.float64) - _FALSE_E) / (_K0 * A)
    y0 = np.asarray(northing, dtype=np.float64)
    if not northern:
        y0 = y0 - 10000000.0
    y = y0 / (_K0 * A)

    xi, eta = y.copy(), x.copy()
    for j in range(6):
        k = 2 * (j + 1)
        xi -= beta[j] * np.sin(k * y) * np.cosh(k * x)
        eta -= beta[j] * np.cos(k * y) * np.sinh(k * x)

    # Conformal latitude -> geographic latitude (Newton on tau).
    sin_xi, cos_xi, sinh_eta = np.sin(xi), np.cos(xi), np.sinh(eta)
    lam = np.arctan2(sinh_eta, cos_xi)
    tau_p = sin_xi / np.sqrt(sinh_eta**2 + cos_xi**2)

    tau = tau_p.copy()
    for _ in range(5):
        sigma = np.sinh(e * np.arctanh(e * tau / np.sqrt(1 + tau**2)))
        f_tau = tau * np.sqrt(1 + sigma**2) - sigma * np.sqrt(1 + tau**2) - tau_p
        df_tau = (
            (np.sqrt((1 + sigma**2) * (1 + tau**2)) - sigma * tau)
            * (1 - e**2)
            * np.sqrt(1 + tau**2)
            / (1 + (1 - e**2) * tau**2)
        )
        tau = tau - f_tau / df_tau

    lat = np.degrees(np.arctan(tau))
    lon = lon0_deg + np.degrees(lam)
    return lon, lat


def tm_forward(
    lon_deg: np.ndarray,
    lat_deg: np.ndarray,
    lon0_deg: float,
    ellipsoid: str = "GRS80",
) -> tuple[np.ndarray, np.ndarray]:
    """Transverse-Mercator forward -> (easting, northing), northern hemisphere."""
    a, f = _ELLIPSOIDS[ellipsoid]
    A, alpha, _beta, e = _tm_constants(a, f)
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64) - lon0_deg)

    tau = np.tan(lat)
    sigma = np.sinh(e * np.arctanh(e * tau / np.sqrt(1 + tau**2)))
    tau_p = tau * np.sqrt(1 + sigma**2) - sigma * np.sqrt(1 + tau**2)

    xi = np.arctan2(tau_p, np.cos(lon))
    eta = np.arcsinh(np.sin(lon) / np.sqrt(tau_p**2 + np.cos(lon) ** 2))
    xi_s, eta_s = xi.copy(), eta.copy()
    for j in range(6):
        k = 2 * (j + 1)
        xi_s += alpha[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_s += alpha[j] * np.cos(k * xi) * np.sinh(k * eta)
    return _K0 * A * eta_s + _FALSE_E, _K0 * A * xi_s


_URN_RE = re.compile(r"^urn:ogc:def:crs:EPSG::(\d+)$", re.IGNORECASE)


def parse_crs(crs: str | None) -> int | None:
    """Accept bare EPSG codes and URN form, as the reference does
    (``utils/FrostUtils.java:984-988``). Returns the EPSG integer or None."""
    if crs is None:
        return None
    s = str(crs).strip()
    if not s:
        return None
    m = _URN_RE.match(s)
    if m:
        return int(m.group(1))
    if s.upper().startswith("EPSG:"):
        s = s.split(":", 1)[1]
    try:
        return int(s)
    except ValueError:
        return None


def epsg_is_latlon_axis_order(epsg: int) -> bool:
    """EPSG:4326 in URN form uses LAT,LON axis order (reference golden test
    ``UtilsTest.java:40-48``)."""
    return epsg == 4326


def to_wgs84(
    x: np.ndarray, y: np.ndarray, epsg: int | None
) -> tuple[np.ndarray, np.ndarray]:
    """Transform coordinate arrays from ``epsg`` to EPSG:4326 (lon, lat).

    Supported: None/4326 (identity), 258xx (ETRS89 UTM, GRS80),
    326xx / 327xx (WGS84 UTM north/south).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if epsg is None or epsg == 4326:
        return x, y
    if 25801 <= epsg <= 25860:
        zone = epsg - 25800
        return tm_inverse(x, y, 6.0 * zone - 183.0, "GRS80", True)
    if 32601 <= epsg <= 32660:
        zone = epsg - 32600
        return tm_inverse(x, y, 6.0 * zone - 183.0, "WGS84", True)
    if 32701 <= epsg <= 32760:
        zone = epsg - 32700
        return tm_inverse(x, y, 6.0 * zone - 183.0, "WGS84", False)
    raise ValueError(f"unsupported EPSG code: {epsg}")


def round_half_even(arr: np.ndarray, scale: int = 6) -> np.ndarray:
    """HALF_EVEN rounding at ``scale`` decimals — numpy's banker's rounding
    matches ``BigDecimal.setScale(scale, HALF_EVEN)``
    (reference ``utils/FrostUtils.java:978-1001``, default scale 6)."""
    return np.round(np.asarray(arr, dtype=np.float64), scale)
