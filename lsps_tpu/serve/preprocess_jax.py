"""On-device preprocessing: depth frame -> normalized 128x128 crop.

The reference does this on the host with numpy/cv2
(handdetector.py:384-492 + dataset_hand2.py:27-31); for serving we fuse
it into the same XLA program as the network so a raw frame goes
device-in, joints-out with no host roundtrip (SURVEY.md §3.4).

Static output shape: the dynamic crop window is handled by inverse-
mapping each output pixel through the crop affine M and gathering with
nearest-neighbor sampling + masking — identical math to
comToBounds/comToTransform, with NN sampling replacing cv2's resize
(sub-pixel rounding may differ by <=1px at the crop border; the host
path remains the bit-parity reference).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def com_to_bounds(com, size, fx, fy):
    """3D cube -> 2D bbox, traced (cf. handdetector.py:206-228)."""
    zstart = com[2] - size[2] / 2.0
    zend = com[2] + size[2] / 2.0
    xstart = jnp.floor((com[0] * com[2] / fx - size[0] / 2.0)
                       / com[2] * fx + 0.5)
    xend = jnp.floor((com[0] * com[2] / fx + size[0] / 2.0)
                     / com[2] * fx + 0.5)
    ystart = jnp.floor((com[1] * com[2] / fy - size[1] / 2.0)
                       / com[2] * fy + 0.5)
    yend = jnp.floor((com[1] * com[2] / fy + size[1] / 2.0)
                     / com[2] * fy + 0.5)
    return xstart, xend, ystart, yend, zstart, zend


def crop_transform(com, size, fx, fy, dsize=(128, 128)):
    """Crop affine M (cf. handdetector.py:449-479), traced.

    Returns (M, inv_scale terms) — M maps original (u, v) to crop (u, v).
    """
    xstart, xend, ystart, yend, _, _ = com_to_bounds(com, size, fx, fy)
    wb = xend - xstart
    hb = yend - ystart
    # aspect-preserving scale: larger side maps to dsize
    scale = jnp.where(wb > hb, dsize[0] / wb, dsize[1] / hb)
    sz_w = jnp.floor(jnp.where(wb > hb, jnp.float32(dsize[0]), wb * scale))
    sz_h = jnp.floor(jnp.where(wb > hb, hb * scale, jnp.float32(dsize[1])))
    xoff = jnp.floor(dsize[0] / 2.0 - sz_w / 2.0)
    yoff = jnp.floor(dsize[1] / 2.0 - sz_h / 2.0)
    M = jnp.array([
        [scale, 0.0, -xstart * scale + xoff],
        [0.0, scale, -ystart * scale + yoff],
        [0.0, 0.0, 1.0],
    ])
    return M, (xstart, ystart, wb, hb, scale, xoff, yoff)


@functools.partial(jax.jit, static_argnames=("dsize", "fx", "fy"))
def crop_normalize(dpt, com, cube, fx: float, fy: float,
                   dsize: Tuple[int, int] = (128, 128)):
    """Full fused preprocess for one frame.

    dpt: (H, W) depth in mm; com: (3,) (u, v, z); cube: (3,) mm.
    Returns (normalized (dh, dw) crop in [-1, 1], M (3, 3)).
    """
    dpt = jnp.asarray(dpt, jnp.float32)
    com = jnp.asarray(com, jnp.float32)
    cube = jnp.asarray(cube, jnp.float32)
    H, W = dpt.shape
    dw, dh = dsize

    M, (xstart, ystart, wb, hb, scale, xoff, yoff) = crop_transform(
        com, cube, fx, fy, dsize)
    zstart = com[2] - cube[2] / 2.0
    zend = com[2] + cube[2] / 2.0

    # inverse-map output pixels to source pixels (NN)
    out_x = jax.lax.broadcasted_iota(jnp.float32, (dh, dw), 1)
    out_y = jax.lax.broadcasted_iota(jnp.float32, (dh, dw), 0)
    src_x = (out_x - xoff) / scale + xstart
    src_y = (out_y - yoff) / scale + ystart
    ix = jnp.floor(src_x).astype(jnp.int32)
    iy = jnp.floor(src_y).astype(jnp.int32)
    inside_dest = ((out_x >= xoff) & (out_x < xoff + jnp.ceil(wb * scale))
                   & (out_y >= yoff) & (out_y < yoff + jnp.ceil(hb * scale)))
    inside_src = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    vals = dpt[jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1)]
    vals = jnp.where(inside_src, vals, 0.0)
    vals = jnp.where(inside_dest, vals, 0.0)

    # z-threshold (handdetector.py:293-297): near -> zstart, far -> 0
    vals = jnp.where((vals < zstart) & (vals != 0), zstart, vals)
    vals = jnp.where((vals > zend) & (vals != 0), 0.0, vals)

    # normalize to [-1, 1] (dataset_hand2.py:27-31)
    vals = jnp.where(vals == 0, zend, vals)
    vals = (vals - com[2]) / (cube[2] / 2.0)
    return vals, M


crop_normalize_batch = jax.vmap(crop_normalize,
                                in_axes=(0, 0, 0, None, None))
