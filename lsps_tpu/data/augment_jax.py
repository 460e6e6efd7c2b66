"""On-device batched augmentation.

The third augmentation backend (host per-sample cv2 = bit-parity
reference; native C++ = fused host batch; this = fused DEVICE batch):
the warp + sentinel/clamp + normalize chain of ``augmentCrop``
(reference dataset_hand2.py:34-119) as ONE jitted XLA program over the
whole batch.

Same op chain as native/lsps_native.cpp `fused_recrop_normalize_batch`
(nv replacement, z-threshold, premax/zero -> far sentinel, clamp,
normalize).  Numerics differ slightly from the C++ kernel: coordinates
are computed in float32 (vs double) and NN rounding is floor(x + 0.5)
(half away from zero for in-bounds coords, matching lround there) — so
pixel-level disagreements cluster at warp rounding boundaries; the
parity test requires >=99% pixel agreement, labels exact.

Integration notes: called through the DataLoader (fast_backend="jax")
the result is pulled back to numpy to honor the loader's tuple contract
— one extra device->host->device round-trip per batch.  For a fully
on-device pipeline call this function directly with device arrays and
feed its output straight into the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def device_recrop_normalize_batch(src, minv, com_z, cube_z, premax,
                                  zstart, zend, pad_value=0.0,
                                  nv_val=32000.0):
    """src: (B, H, W) raw mm crops; minv: (B, 3, 3) dst->src transforms;
    per-sample scalars (B,).  Returns (B, H, W) normalized crops."""
    src = jnp.asarray(src, jnp.float32)
    b, h, w = src.shape

    out_x = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    out_y = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    def one(s, m, cz, qz, pm, zs, ze):
        ww = m[2, 0] * out_x + m[2, 1] * out_y + m[2, 2]
        sx = (m[0, 0] * out_x + m[0, 1] * out_y + m[0, 2]) / ww
        sy = (m[1, 0] * out_x + m[1, 1] * out_y + m[1, 2]) / ww
        # floor(x + 0.5): half away from zero for positive (in-bounds)
        # coords, matching the C++ kernel's lround there
        ix = jnp.floor(sx + 0.5).astype(jnp.int32)
        iy = jnp.floor(sy + 0.5).astype(jnp.int32)
        inside = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        v = s[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
        v = jnp.where(inside, v, pad_value)
        v = jnp.where(jnp.abs(v - nv_val) <= 1e-5 * abs(nv_val),
                      pad_value, v)
        v = jnp.where((v != 0.0) & (v < zs), zs, v)
        v = jnp.where((v != 0.0) & (v > ze), 0.0, v)
        far = cz + qz * 0.5
        near = cz - qz * 0.5
        v = jnp.where((v == pm) | (v == 0.0), far, v)
        v = jnp.clip(v, near, far)
        return (v - cz) / (qz * 0.5)

    return jax.vmap(one)(src, jnp.asarray(minv, jnp.float32),
                         jnp.asarray(com_z, jnp.float32),
                         jnp.asarray(cube_z, jnp.float32),
                         jnp.asarray(premax, jnp.float32),
                         jnp.asarray(zstart, jnp.float32),
                         jnp.asarray(zend, jnp.float32))
