"""On-device hand detection: raw depth frame -> CoM, jittable.

The reference detects the hand host-side with OpenCV: a closest-object
depth sweep over 65 slices picking the first contour with area > 200 px
(src/utils/handdetector.py:571-636), then 5 iterations of CoM
refinement inside the metric cube (:548-569).  This module is the
TPU-resident redesign so the WHOLE live path — detect -> crop/normalize
-> regress -> decode — runs as one XLA program
(``PoseEstimator.predict_raw``), no host round-trip per frame.

Contour-free reformulation (XLA has no findContours):

* slice predicate: instead of "some contour area > 200", count
  *interior* pixels (3x3 neighborhood fully inside the slice mask, via
  min/max reduce_windows over a per-pixel slice-index plane) — a
  connected blob of contour area ~200 has interior pixels, scattered
  speckle does not.  Threshold 150 interior px ~= area 200 minus
  perimeter.
* blob centroid: mask centroid (equals the contour moment centroid for
  a filled blob), computed for the selected slice only.
* box crop + z-window CoM and the 5-iteration refinement run as masked
  full-frame reductions (no dynamic shapes).
* the whole 60-slice sweep touches the f32 frame once (slice-index
  construction) and an int8 index plane thereafter — ~35 MB of HBM
  traffic vs ~360 MB for the naive per-slice-mask form.

Deviations from the host path (single-hand scenes are identical in
practice; pinned by tests/test_detect_jax.py against
``HandDetector.detect``): multi-object slices pick the blob by combined
centroid rather than cv2 contour order, and the empty-crop "take the
center pixel depth" fallback keeps the previous CoM instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _masked_com(vals, weight):
    """calculate_com semantics (handdetector.py:93-110): unweighted mean
    of masked pixel coords + mean masked depth."""
    h, w = vals.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    wts = weight.astype(jnp.float32)
    n = jnp.sum(wts)
    safe = jnp.maximum(n, 1.0)
    com = jnp.stack([jnp.sum(xs * wts) / safe,
                     jnp.sum(ys * wts) / safe,
                     jnp.sum(vals * wts) / safe])
    return com, n


@functools.partial(jax.jit,
                   static_argnames=("fx", "fy", "steps", "interior_min",
                                    "refine_iters"))
def device_detect(dpt, cube, fx: float, fy: float, steps: int = 65,
                  interior_min: int = 150, refine_iters: int = 5):
    """(H, W) raw depth frame in mm -> (3,) CoM (u, v, z[mm]).

    Jittable port of ``HandDetector.detect`` + ``refine_com_iterative``
    (handdetector.py:571-636, 548-569).  Returns zeros when no slice
    qualifies (like the reference).
    """
    assert steps <= 127, "slice index must fit in int8"
    dpt = jnp.asarray(dpt, jnp.float32)
    cube = jnp.asarray(cube, jnp.float32)
    h, w = dpt.shape
    max_depth = jnp.minimum(6500.0, dpt.max())
    min_depth = jnp.maximum(10.0, dpt.min())
    d = jnp.where((dpt > max_depth) | (dpt < min_depth), 0.0, dpt)
    dz = (max_depth - min_depth) / float(steps)

    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    # ONE-PASS sweep (round 3): the naive form — vmap of per-slice
    # masks/centroids over ~60 slices — reads the f32 frame plane ~5x
    # per slice (~360 MB of HBM traffic, the dominant cost of the raw
    # serve path).  Instead: a per-pixel slice-index plane (int8;
    # invalid pixels -> -1), the interior test as two 3x3 min/max
    # reduce_windows (all-9-in-one-slice <=> windowed min == max), and
    # per-slice interior counts read the 0.3 MB int8 plane only.  The
    # blob centroid is then computed for the SELECTED slice alone.
    # Boundary semantics shift by a measure-zero set: the old per-slice
    # interval was [lo, hi] inclusive both ends, the index plane assigns
    # d == hi to the next slice.
    s = jnp.floor((d - min_depth) / dz).astype(jnp.int32)
    s = jnp.clip(s, 0, steps - 1)                 # d == max -> last slice
    s = jnp.where(d > 0.0, s, -1).astype(jnp.int8)

    sf = s.astype(jnp.float32)
    smin = jax.lax.reduce_window(sf, jnp.inf, jax.lax.min, (3, 3), (1, 1),
                                 "SAME")
    smax = jax.lax.reduce_window(sf, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
                                 "SAME")
    inb = (xs >= 1) & (xs < w - 1) & (ys >= 1) & (ys < h - 1)
    interior = (smin == smax) & (s >= 0) & inb    # border: <9 neighbors
    q = jnp.where(interior, s, jnp.int8(-1))

    ks = jnp.arange(5, steps, dtype=jnp.int8)     # skip nearest slices
    counts = jax.vmap(
        lambda k: jnp.sum((q == k).astype(jnp.int32)))(ks)
    oks = counts >= interior_min
    any_ok = jnp.any(oks)
    first = jnp.argmax(oks)  # first qualifying slice (closest object)
    kf = ks[first].astype(jnp.float32)
    lo = kf * dz + min_depth
    hi = (kf + 1.0) * dz + min_depth

    # blob centroid of the selected slice's full mask (invalid pixels
    # carry s == -1, so the index plane alone decides membership)
    mf = (s == ks[first]).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mf), 1.0)
    cx = jnp.round(jnp.sum(xs * mf) / n)
    cy = jnp.round(jnp.sum(ys * mf) / n)

    # +-100 px box around the blob centroid, z-limited to the slice
    # (handdetector.py:600-612); CoM in absolute coords
    xstart = jnp.maximum(cx - 100.0, 0.0)
    xend = jnp.minimum(cx + 100.0, float(w - 1))
    ystart = jnp.maximum(cy - 100.0, 0.0)
    yend = jnp.minimum(cy + 100.0, float(h - 1))
    inbox = ((xs >= xstart) & (xs < xend) & (ys >= ystart) & (ys < yend))
    m0 = inbox & (d >= lo) & (d <= hi) & (d > 0)
    com, _ = _masked_com(d, m0)

    # iterative refinement with the full metric cube
    # (refine_com_iterative, handdetector.py:548-569): bounds from the
    # current CoM, get_crop z-threshold (< zstart -> zstart, > zend ->
    # 0), then calculate_com again
    def refine(_, com):
        zs = com[2] - cube[2] / 2.0
        ze = com[2] + cube[2] / 2.0
        xst = jnp.floor((com[0] * com[2] / fx - cube[0] / 2.0)
                        / com[2] * fx + 0.5)
        xen = jnp.floor((com[0] * com[2] / fx + cube[0] / 2.0)
                        / com[2] * fx + 0.5)
        yst = jnp.floor((com[1] * com[2] / fy - cube[1] / 2.0)
                        / com[2] * fy + 0.5)
        yen = jnp.floor((com[1] * com[2] / fy + cube[1] / 2.0)
                        / com[2] * fy + 0.5)
        box = (xs >= xst) & (xs < xen) & (ys >= yst) & (ys < yen)
        v = jnp.where(box, d, 0.0)
        v = jnp.where((v < zs) & (v != 0.0), zs, v)   # near clamp
        v = jnp.where(v > ze, 0.0, v)                 # far cut
        valid = box & (v >= min_depth) & (v <= max_depth) & (v != 0.0)
        new_com, n = _masked_com(v, valid)
        return jnp.where(n > 0, new_com, com)

    com = jax.lax.fori_loop(0, refine_iters, refine, com)
    return jnp.where(any_ok, com, jnp.zeros(3))


def device_detect_batch(frames, cubes, fx: float, fy: float, **kw):
    """(B, H, W) frames + (B, 3) cubes -> (B, 3) CoMs."""
    fn = functools.partial(device_detect, fx=fx, fy=fy, **kw)
    return jax.vmap(fn)(jnp.asarray(frames, jnp.float32),
                        jnp.asarray(cubes, jnp.float32))
