"""Per-image quality metrics for training-data filtering (graft-cell
requirement; no reference analogue — the importer never inspects pixel
content). The four classics an image-corpus curation pass filters on:

- ``entropy_bits``   Shannon entropy of the 256-bin luma histogram
                     (0 = flat color, 8 = maximal detail); low-entropy
                     images are banners/placeholders.
- ``rms_contrast``   luma standard deviation normalized to [0, 1].
- ``sharpness``      mean absolute 4-neighbor Laplacian of luma
                     (normalized luma units); low = blurry/upscaled.
- ``colorfulness``   Hasler & Suesstrunk (SPIE 2003) opponent-space
                     metric sqrt(s_rg^2 + s_yb^2) +
                     0.3*sqrt(mu_rg^2 + mu_yb^2), in [0, ~1.3].

Determinism contract (what lets a committed golden pin the distributed
output): every accumulation is EXACT integer arithmetic — milli-luma
``299r + 587g + 114b`` (int64), integer histogram, integer sum /
sum-of-squares, integer Laplacian, integer opponent channels — and
floats appear only in the final per-image normalization, computed in a
fixed operation order. The same function runs per image in the engine's
batch and in the fixture oracle, so results are bit-identical at any
batch size or partitioning (the r4 exact-kernel design, applied here).

One residual float dependency: entropy sums np.log2 terms, and libm
log2 is not guaranteed correctly rounded across platforms. Engine and
golden always run in the same environment here (the generator stamps
regenerate the golden alongside the code), so this cannot red a
contract row in-sandbox; porting the golden to a different
libm/numpy could flip a 6th decimal at a rounding boundary — regenerate
the golden rather than debug it (same posture as the BLAS note in
codecs.py).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["quality_metrics"]


def _r6(x: float) -> float:
    """floor(x*1e6 + 0.5)/1e6 — the repo's cross-engine-stable rounding
    (identical IEEE op sequence everywhere; all metric values >= 0)."""
    return math.floor(x * 1e6 + 0.5) / 1e6


def quality_metrics(img: np.ndarray) -> tuple[float, float, float, float]:
    """(entropy_bits, rms_contrast, sharpness, colorfulness) for one
    (h, w, 3) uint8 image. Images with h < 3 or w < 3 report 0.0
    sharpness (no interior for the Laplacian)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = img.shape
    npx = h * w
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    lum = 299 * r + 587 * g + 114 * b  # milli-luma, 0..255000, exact

    # entropy over the exact integer 256-bin histogram
    hist = np.bincount((lum // 1000).ravel(), minlength=256)
    p = hist[hist > 0].astype(np.float64) / float(npx)
    entropy = float(-(p * np.log2(p)).sum())

    # RMS contrast from exact integer first/second moments
    s1 = int(lum.sum())
    s2 = int((lum * lum).sum())
    var = s2 / npx - (s1 / npx) ** 2  # (milli-luma)^2
    rms_contrast = math.sqrt(max(var, 0.0)) / 1000.0 / 255.0

    # sharpness: mean |4-neighbor integer Laplacian| over the interior
    if h >= 3 and w >= 3:
        core = lum[1:-1, 1:-1]
        lap = (
            4 * core
            - lum[:-2, 1:-1]
            - lum[2:, 1:-1]
            - lum[1:-1, :-2]
            - lum[1:-1, 2:]
        )
        sharpness = int(np.abs(lap).sum()) / (core.size * 1000.0 * 255.0)
    else:
        sharpness = 0.0

    # Hasler-Suesstrunk colorfulness from exact opponent-channel moments
    # rg = r - g; yb = (r + g)/2 - b kept doubled (yb2 = r + g - 2b) so
    # the accumulation stays integer; halved at normalization time.
    rg = r - g
    yb2 = r + g - 2 * b
    mu_rg = int(rg.sum()) / npx
    mu_yb = int(yb2.sum()) / npx / 2.0
    var_rg = int((rg * rg).sum()) / npx - mu_rg * mu_rg
    var_yb = int((yb2 * yb2).sum()) / npx / 4.0 - mu_yb * mu_yb
    colorfulness = (
        math.sqrt(max(var_rg, 0.0) + max(var_yb, 0.0))
        + 0.3 * math.sqrt(mu_rg * mu_rg + mu_yb * mu_yb)
    ) / 255.0

    return (_r6(entropy), _r6(rms_contrast), _r6(sharpness), _r6(colorfulness))
