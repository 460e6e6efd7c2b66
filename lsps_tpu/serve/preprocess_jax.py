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

Two warp lowerings, selected by the static ``warp`` argument:

* ``"gather"`` — elementwise ``dpt[iy, ix]`` advanced indexing.
* ``"einsum"`` — the crop affine is axis-aligned (pure scale +
  translation, no rotation), so the NN selection is SEPARABLE: build
  one-hot row/column selector matrices R (dh, H) and C (dw, W) and
  compute ``R @ dpt @ C^T`` at ``Precision.HIGHEST`` (exact: each
  output pixel is 1.0 * value + zeros).  Same lesson as the training
  augment warp (data/augment_jax.py): inside large programs XLA can
  lower elementwise gathers to scalar-loop fusions; one-hot
  contractions are MXU work it cannot degrade.  Bit-identical to
  "gather" by construction (pinned by tests/test_preprocess_jax.py);
  non-finite input pixels are sanitized to the invalid-depth sentinel
  0 up front, so the einsum full-frame contraction cannot be poisoned
  by a stray NaN/inf the gather path would never read.

``"einsum"`` is the default: the round-3 on-chip A/B
(scripts/serve_ab.sh) measured the gather lowering inside the fused
serving program at 7.3 ms device time for a batch-32 call vs 0.68 ms
for einsum (11x), growing to 34x at batch 256 — the same scalar-loop
degradation the training augment hit.  Per-image cost-model traffic
drops from ~87 MB to ~11 MB.  Outputs are bit-identical either way.
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


@functools.partial(jax.jit, static_argnames=("dsize", "fx", "fy", "warp"))
def crop_normalize(dpt, com, cube, fx: float, fy: float,
                   dsize: Tuple[int, int] = (128, 128),
                   warp: str = "einsum"):
    """Full fused preprocess for one frame.

    dpt: (H, W) depth in mm; com: (3,) (u, v, z); cube: (3,) mm.
    Returns (normalized (dh, dw) crop in [-1, 1], M (3, 3)).
    """
    dpt = jnp.asarray(dpt, jnp.float32)
    # Non-finite pixels -> 0 (the pipeline's invalid-depth sentinel).
    # Beyond hygiene this is what makes the two warp lowerings truly
    # equivalent: the einsum path contracts over EVERY frame pixel with
    # 0/1 weights, and a single NaN/inf anywhere (0 * inf = NaN) would
    # poison the whole crop, while the gather path only reads sampled
    # pixels (round-3 review finding).
    dpt = jnp.where(jnp.isfinite(dpt), dpt, 0.0)
    com = jnp.asarray(com, jnp.float32)
    cube = jnp.asarray(cube, jnp.float32)
    H, W = dpt.shape
    dw, dh = dsize

    M, (xstart, ystart, wb, hb, scale, xoff, yoff) = crop_transform(
        com, cube, fx, fy, dsize)
    zstart = com[2] - cube[2] / 2.0
    zend = com[2] + cube[2] / 2.0

    # inverse-map output pixels to source pixels (NN).  The affine is
    # axis-aligned, so the source coordinate is separable: x depends
    # only on the output column, y only on the output row.
    col = jnp.arange(dw, dtype=jnp.float32)
    row = jnp.arange(dh, dtype=jnp.float32)
    ix1 = jnp.floor((col - xoff) / scale + xstart).astype(jnp.int32)
    iy1 = jnp.floor((row - yoff) / scale + ystart).astype(jnp.int32)
    in_dest = (((col >= xoff) & (col < xoff + jnp.ceil(wb * scale)))[None, :]
               & ((row >= yoff) & (row < yoff + jnp.ceil(hb * scale)))[:, None])
    in_src = (((ix1 >= 0) & (ix1 < W))[None, :]
              & ((iy1 >= 0) & (iy1 < H))[:, None])
    if warp == "einsum":
        # one-hot row/col selection: R (dh, H) @ dpt (H, W) @ C^T (W, dw)
        # — exact at HIGHEST precision, and ordinary MXU work (see
        # module docstring)
        R = (iy1[:, None] == jnp.arange(H)).astype(jnp.float32)
        C = (ix1[:, None] == jnp.arange(W)).astype(jnp.float32)
        vals = jnp.einsum("yh,hw,xw->yx", R, dpt, C,
                          precision=jax.lax.Precision.HIGHEST)
    elif warp == "gather":
        vals = dpt[jnp.clip(iy1, 0, H - 1)[:, None],
                   jnp.clip(ix1, 0, W - 1)[None, :]]
    else:
        raise ValueError(f"unknown warp method {warp!r}")
    vals = jnp.where(in_src, vals, 0.0)
    vals = jnp.where(in_dest, vals, 0.0)

    # z-threshold (handdetector.py:293-297): near -> zstart, far -> 0
    vals = jnp.where((vals < zstart) & (vals != 0), zstart, vals)
    vals = jnp.where((vals > zend) & (vals != 0), 0.0, vals)

    # normalize to [-1, 1] (dataset_hand2.py:27-31)
    vals = jnp.where(vals == 0, zend, vals)
    vals = (vals - com[2]) / (cube[2] / 2.0)
    return vals, M


def crop_normalize_batch(frames, coms, cubes, fx, fy,
                         dsize=(128, 128), warp: str = "einsum"):
    """Batched ``crop_normalize`` (vmapped over frames/coms/cubes).

    ``warp="pallas"`` routes the whole warp+normalize tail through the
    fused Pallas kernel (ops/pallas/warp.py) instead of the vmapped
    einsum program — bit-identical outputs (tests/test_pallas_warp.py),
    A/B'd on the real chip by scripts/serve_warp_ab.py."""
    if warp == "pallas":
        from lsps_tpu.ops.pallas.warp import crop_normalize_batch_pallas

        return crop_normalize_batch_pallas(frames, coms, cubes, fx, fy,
                                           dsize=dsize)
    fn = functools.partial(crop_normalize, fx=fx, fy=fy, dsize=dsize,
                           warp=warp)
    return jax.vmap(fn)(frames, coms, cubes)
