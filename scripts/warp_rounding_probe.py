"""Quantify pixel-level divergence between the augment backends.

With identical per-sample warp params (shared ``FastAugmenter.raw_batch``
draws), the native C++ kernel does its coordinate math in f64 while the
jax / in-step warp uses f32 — nearest-neighbour rounding can flip a
source pixel where ``floor(x + 0.5)`` straddles a representability
boundary.  This probe measures how often and how large: the answer
(docs/BENCHMARKS.md "fused-step accuracy A/B") is ~2/64 images touched,
~1e-5 of pixels overall, near-full-range deltas (hand/background edge
flips) — enough to decohere two GAN runs, far too sparse to plausibly
change data semantics.

Usage: JAX_PLATFORMS=cpu python scripts/warp_rounding_probe.py [n]
"""

import sys

import numpy as np

import lsps_tpu.data.datasets  # noqa: F401  (registry side effects)
import lsps_tpu.data.synthetic  # noqa: F401
from lsps_tpu.config import NetConfig
from lsps_tpu.data.fast_augment import FastAugmenter, NV_VAL, PAD_VALUE
from lsps_tpu.data.loader import get_dataset


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    config = NetConfig("exps/synth_full.yaml")
    ds = get_dataset(config.datasets["train_a"])
    fa = FastAugmenter(ds, backend="native")

    idxs = np.arange(n) % len(ds.seq.dpt)
    raw = fa.raw_batch(idxs)[0]

    from lsps_tpu import native

    imgs_native = native.fused_recrop_normalize_batch(
        *raw, pad_value=PAD_VALUE, nv_val=NV_VAL)

    from lsps_tpu.data.augment_jax import device_recrop_normalize_batch

    imgs_jax = np.asarray(device_recrop_normalize_batch(
        *raw, pad_value=PAD_VALUE, nv_val=NV_VAL))

    d = imgs_native - imgs_jax
    nz = d != 0
    per_img = nz.reshape(n, -1).mean(axis=1)
    print("batch", imgs_native.shape, "dtype", imgs_native.dtype)
    print("pixels differing: %.6f%% overall; per-image max %.4f%%"
          % (100 * nz.mean(), 100 * per_img.max()))
    print("images with ANY differing pixel: %d / %d"
          % (int((per_img > 0).sum()), n))
    if nz.any():
        vals = np.abs(d[nz])
        print("diff magnitudes (range [-1,1]): p50 %.4f p90 %.4f max %.4f"
              % tuple(np.percentile(vals, [50, 90, 100])))


if __name__ == "__main__":
    main()
