"""Latent-walk generative sampler CLI.

Reproduces the reference's generative result (README.md:25-26,
``img/walk_nyu.gif``): encode two depth crops into the shared latent
space, interpolate, and decode the path through both domain decoders,
writing an AVI (and PNG strip) of the walk.

Usage: ``python -m lsps_tpu.cli.latent_walk --config exps/synth.yaml
--steps 16 --out walk.avi``
"""

from __future__ import annotations

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from lsps_tpu.cli import common as C
from lsps_tpu.serve.inference import latent_walk


def main(argv=None):
    parser = C.base_parser("LSPS-TPU latent walk")
    parser.add_argument("--steps", type=int, default=16)
    parser.add_argument("--out", type=str, default="walk.avi")
    parser.add_argument("--idx", type=int, default=-1)
    opts = parser.parse_args(argv)

    config = C.load_experiment(opts)
    trainer = C.make_trainer(config, sch_interval=1000)
    state = trainer.init_state(jax.random.PRNGKey(opts.seed))
    state, it = trainer.resume(state, config.snapshot_prefix, idx=opts.idx)
    if it == 0:
        print("warning: no checkpoint found, walking an untrained model")

    _, _, dataset_test = C.make_datasets(config)
    i0, i1 = 0, min(1, len(dataset_test) - 1)
    img0 = np.transpose(dataset_test[i0][0], (1, 2, 0))[None]
    img1 = np.transpose(dataset_test[i1][0], (1, 2, 0))[None]

    gen = trainer.gen
    gp = state["params"]["gen"]
    z0, z1 = gen.encode(gp, jnp.asarray(img0), jnp.asarray(img1))
    out_a, out_b = latent_walk(gen, gp, z0[0], z1[0], steps=opts.steps)

    import cv2

    os.makedirs(os.path.dirname(opts.out) or ".", exist_ok=True)
    codec = cv2.VideoWriter_fourcc(*"XVID")
    vid = cv2.VideoWriter(opts.out, codec, 8, (128 * 2, 128))
    for a, b in zip(out_a, out_b):
        fa = ((a[..., 0] + 1) * 127.5).astype("uint8")
        fb = ((b[..., 0] + 1) * 127.5).astype("uint8")
        frame = cv2.cvtColor(np.hstack([fa, fb]), cv2.COLOR_GRAY2BGR)
        vid.write(frame)
    vid.release()
    strip = np.hstack([((a[..., 0] + 1) * 127.5).astype("uint8")
                       for a in out_a])
    cv2.imwrite(os.path.splitext(opts.out)[0] + "_strip.png", strip)
    print(f"wrote {opts.out} ({opts.steps} steps)")


if __name__ == "__main__":
    main(sys.argv[1:])
