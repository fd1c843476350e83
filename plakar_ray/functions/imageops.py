"""Pure-numpy image ops for the media stages (no PIL/OpenCV needed).

`resize_bilinear` / `resize_nearest` follow the standard half-pixel
(align_corners=False) sampling convention: source coordinate of output
pixel i is (i + 0.5) * scale - 0.5, clamped to the image. Bilinear
interpolates the 2x2 neighborhood with float64 weights and rounds to
uint8 at the end (round-half-up, matching the repo's e6 rounding rule).
"""

from __future__ import annotations

import numpy as np


def _src_coords(out_n: int, in_n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(lo index, hi index, hi weight) per output pixel along one axis."""
    pos = (np.arange(out_n, dtype=np.float64) + 0.5) * (in_n / out_n) - 0.5
    pos = np.clip(pos, 0.0, in_n - 1.0)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, in_n - 1)
    return lo, hi, pos - lo


def resize_bilinear(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, c) uint8/uint16 -> (out_h, out_w, c) same dtype."""
    h, w = px.shape[:2]
    ylo, yhi, wy = _src_coords(out_h, h)
    xlo, xhi, wx = _src_coords(out_w, w)
    p = px.astype(np.float64)
    top = p[ylo][:, xlo] * (1 - wx)[None, :, None] + p[ylo][:, xhi] * wx[None, :, None]
    bot = p[yhi][:, xlo] * (1 - wx)[None, :, None] + p[yhi][:, xhi] * wx[None, :, None]
    out = top * (1 - wy)[:, None, None] + bot * wy[:, None, None]
    return np.floor(out + 0.5).astype(px.dtype)


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """(h, w, c) any dtype -> (out_h, out_w, c); nearest source pixel
    under the same half-pixel convention (ties round down via floor of
    pos + 0.5)."""
    h, w = px.shape[:2]
    ys = np.clip(
        np.floor((np.arange(out_h) + 0.5) * (h / out_h)).astype(np.int64), 0, h - 1
    )
    xs = np.clip(
        np.floor((np.arange(out_w) + 0.5) * (w / out_w)).astype(np.int64), 0, w - 1
    )
    return px[ys][:, xs]
