"""Visual RISK statistics for the LAION/DataComp-style filter chain:
watermark-overlay likelihood, skin-exposure (NSFW stand-in) fraction,
and a composite aesthetic score.

Like kernels/imgstats.py, every fraction is an exact int64 count over
the decoded uint8 pixels divided once at the end, so results are
batch-composition-invariant and bit-identical between the Spark
pandas-UDF path and the driver-side numpy oracle (the repo-wide
shared-kernel invariant).

Public-knowledge provenance:
* watermark overlays concentrate in the bottom strip / bottom-right
  corner as near-white low-saturation pixels (the LAION-5B release
  used a trained watermark classifier; this is the classical
  region-statistic stand-in — a real model is [ENV]-unavailable, the
  Spark plumbing and the thresholded-decision shape are the point);
* the skin-pixel RGB rule is Kovac et al. 2003 ("Human skin colour
  clustering for face detection") — the standard explicit-rule NSFW
  stand-in;
* the aesthetic score is a fixed linear blend of the already-exact
  imgstats features (entropy, RMS contrast, colorfulness, 1 -
  flat_frac), the classical hand-crafted stand-in for a trained
  aesthetic predictor (Ke et al. 2006 use the same feature family).

The reference repo (/root/reference, 2-line README) names the
capability ("test Data Quality for Big Size data"); the realization
is ours.
"""

from __future__ import annotations

import numpy as np

from .imgstats import gray_luma, quality_stats

# watermark region geometry: bottom strip = h//8 rows (>=1), corner =
# bottom-right (h//4) x (w//4) block (>=1 each). Overlay pixel test:
# near-white (gray >= 200) AND low-saturation (max-min <= 32).
WM_GRAY_MIN = 200
WM_SAT_MAX = 32

# aesthetic blend normalizers (feature -> [0,1] saturating caps)
AES_ENTROPY_CAP = 8.0     # bits; full 256-bin histogram
AES_CONTRAST_CAP = 64.0   # RMS gray std-dev
AES_COLOR_CAP = 48.0      # Hasler-Suesstrunk colorfulness


def risk_stats(pix: np.ndarray) -> dict:
    """All risk statistics for one decoded HxWx3 uint8 image.

    Returns plain Python floats:
      wm_strip_frac   share of bottom-strip pixels that look like a
                      white overlay (near-white, low saturation)
      wm_corner_frac  same over the bottom-right corner block
      skin_frac       share of pixels passing the Kovac skin rule
      aesthetic       0..1 linear blend of entropy / contrast /
                      colorfulness / (1 - flat_frac)
    """
    p = pix.astype(np.int64)
    gray = gray_luma(pix)
    sat = p.max(axis=2) - p.min(axis=2)
    h, w = gray.shape
    n = gray.size

    overlay = (gray >= WM_GRAY_MIN) & (sat <= WM_SAT_MAX)

    sh = max(1, h // 8)
    strip = overlay[h - sh:, :]
    wm_strip_frac = float(int(strip.sum())) / strip.size

    ch, cw = max(1, h // 4), max(1, w // 4)
    corner = overlay[h - ch:, w - cw:]
    wm_corner_frac = float(int(corner.sum())) / corner.size

    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    skin = ((r > 95) & (g > 40) & (b > 20) & (sat > 15)
            & (np.abs(r - g) > 15) & (r > g) & (r > b))
    skin_frac = float(int(skin.sum())) / n

    st = quality_stats(pix)
    aesthetic = (
        0.25 * min(st["entropy_bits"] / AES_ENTROPY_CAP, 1.0)
        + 0.25 * min(st["contrast_rms"] / AES_CONTRAST_CAP, 1.0)
        + 0.25 * min(st["colorfulness"] / AES_COLOR_CAP, 1.0)
        + 0.25 * (1.0 - st["flat_frac"])
    )

    return {
        "wm_strip_frac": wm_strip_frac,
        "wm_corner_frac": wm_corner_frac,
        "skin_frac": skin_frac,
        "aesthetic": float(aesthetic),
    }
