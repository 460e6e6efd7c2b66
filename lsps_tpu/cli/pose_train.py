"""Pose-VAE training CLI (README step 1).

Reference loop: src/pose_train.py:63-190 — trains ``poseVAE`` on sampled
3D poses from domain A (synth) + a fraction of domain B (real), with
periodic reconstruction-error eval, skeleton visualization, and
fraction-keyed VAE checkpoints.

Usage: ``python -m lsps_tpu.cli.pose_train --config exps/nnyu.yaml
--frac 0.1 --log ./logs``
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from lsps_tpu.cli import common as C
from lsps_tpu.data.loader import get_data_loader
from lsps_tpu.utils import viz
from lsps_tpu.utils.logging import (MetricsWriter,
                                    prepare_snapshot_and_image_folder,
                                    profile_trace, write_loss)

MAX_EPOCHS = 100000
POSE_MAX_ITERATIONS = 200000  # pose_train.py:82


def main(argv=None):
    parser = C.base_parser("LSPS-TPU pose VAE training")
    opts = parser.parse_args(argv)

    Evaluation, color_idx, bones = C.select_eval(opts.config)
    config = C.load_experiment(opts)
    hyp = config.hyperparameters

    batch_size = opts.batch_size or hyp["batch_size_pose"]
    max_iterations = (opts.max_iterations or POSE_MAX_ITERATIONS)
    frac = opts.frac

    dataset_a, dataset_b, dataset_test = C.make_datasets(config)
    trainer = C.make_trainer(config,
                             sch_interval=opts.sch_interval or 1000)
    state = trainer.init_state(jax.random.PRNGKey(opts.seed))
    iterations = 0

    dataset_a.pose_only = True
    dataset_b.pose_only = True
    if 0.0 < frac < 1.0:
        dataset_b.set_nmax(frac)
    di_b = dataset_b.di

    dataset_a.sample_poses()
    dataset_b.sample_poses()

    loader_a = get_data_loader(dataset_a, batch_size, shuffle=True,
                               seed=opts.seed)
    loader_b = get_data_loader(dataset_b, batch_size, shuffle=True,
                               seed=opts.seed + 1)
    test_loader = get_data_loader(dataset_test, 64, shuffle=True,
                                  seed=opts.seed + 2)

    writer = MetricsWriter(os.path.join(
        opts.log, os.path.splitext(os.path.basename(opts.config))[0]))
    image_dir, snap_dir = prepare_snapshot_and_image_folder(
        config.snapshot_prefix, iterations, config.image_save_iterations)

    if min(len(dataset_a), len(dataset_b)) < batch_size:
        raise ValueError(
            f"batch_size {batch_size} exceeds dataset sizes "
            f"({len(dataset_a)}, {len(dataset_b)}); every batch would be "
            "skipped")

    # data-parallel path (--mesh-data): pose labels shard over the
    # mesh's data axis, vae params/optimizer replicate (SURVEY §2.8)
    mesh_runner = C.make_mesh_runner(opts)
    if mesh_runner is not None:
        # the batch fed to vae_step is concat(labels_a, labels_b) when
        # frac > 0 (the reference's pose_train.py:125-130), so the
        # divisibility constraint applies to 2*batch_size there
        mesh_runner.check_batch(
            2 * batch_size if frac > 0.0 else batch_size,
            what="vae batch size" if frac > 0.0 else "batch size")
        state = mesh_runner.shard_state(state)
        vae_step = mesh_runner.wrap(trainer._vae_update, 1)
        print(f"data-parallel over {mesh_runner.n_data} devices")

    # multi-step dispatch (--steps-per-call K): the pose-VAE step is a
    # tiny MLP, so per-dispatch host overhead dominates wall time on a
    # tunneled host; scanning K steps per program amortizes it K-fold
    # with the identical rng chain (trainer.vae_scan)
    # default (0 = auto) resolves to scan-8 here: measured ~2x wall win
    # on the dispatch-bound pose step (docs/BENCHMARKS.md round-3
    # full-size chain), identical numerics
    steps_per_call = C.resolve_steps_per_call(opts, auto=8)
    vae_scan_fn = None
    if steps_per_call > 1 and mesh_runner is not None:
        # mesh + scan: (K, B, D) label stacks shard on axis 1 (batch)
        vae_scan_fn = mesh_runner.wrap(trainer._vae_scan, 1, batch_axis=1)
    # chunks may END on (never straddle) the eval/snapshot cadences;
    # display writes slice the stacked per-step metrics
    state_cadences = (10 * config.image_save_iterations,
                      4 * config.snapshot_save_iterations)

    print(f"using {frac:.2f} percent of the labeled real data")
    rngs = jax.random.split(jax.random.PRNGKey(opts.seed + 7), 2)[0]
    start = time.time()
    pending = []
    n_plan = 0
    with profile_trace(opts.profile_dir):
        for ep in range(MAX_EPOCHS):
            for labels_a, labels_b in zip(iter(loader_a), iter(loader_b)):
                if (labels_a.shape[0] != batch_size
                        or labels_b.shape[0] != batch_size):
                    continue
                labels = labels_a
                if frac > 0.0:
                    labels = np.concatenate([labels_a, labels_b], 0)

                host_mets = mets = None
                if steps_per_call > 1:
                    if not pending:
                        n_plan = C.chunk_len(iterations, steps_per_call,
                                             state_cadences,
                                             max_iterations)
                    if n_plan == steps_per_call:
                        pending.append(labels)
                        if len(pending) < n_plan:
                            continue
                        keys, rngs = C.fold_chain(rngs, iterations, n_plan)
                        if vae_scan_fn is not None:
                            state, mets, _ = vae_scan_fn(
                                state, np.stack(pending), keys)
                        else:
                            state, mets, _ = trainer.vae_scan(
                                state, np.stack(pending), keys)
                        pending = []
                        n_done = n_plan
                    else:
                        # within K steps of a cadence boundary: single
                        # steps (already compiled) until re-aligned
                        rngs = C.host_fold_in(rngs, iterations)
                        if mesh_runner is not None:
                            state, metrics, _ = vae_step(
                                state, mesh_runner.place(labels), rngs)
                        else:
                            state, metrics, _ = trainer.vae_update(
                                state, jnp.asarray(labels), rngs)
                        n_done = 1
                else:
                    rngs = C.host_fold_in(rngs, iterations)
                    if mesh_runner is not None:
                        state, metrics, _ = vae_step(
                            state, mesh_runner.place(labels), rngs)
                    else:
                        state, metrics, _ = trainer.vae_update(
                            state, jnp.asarray(labels), rngs)
                    n_done = 1

                for j in range(n_done):
                    if (iterations + 1) % config.display == 0:
                        if mets is not None:
                            if host_mets is None:
                                host_mets = jax.device_get(mets)
                            metrics = {k: v[j]
                                       for k, v in host_mets.items()}
                        write_loss(iterations, max_iterations, metrics,
                                   writer, time.time() - start)
                        start = time.time()

                    if (iterations + 1) % (10
                                           * config.image_save_iterations) \
                            == 0:
                        _evaluate(trainer, state, test_loader, di_b,
                                  Evaluation, color_idx, bones, image_dir)

                    if (iterations + 1) % (4
                                           * config.snapshot_save_iterations
                                           ) == 0:
                        trainer.save_vae(state, config.snapshot_prefix,
                                         iterations, 2 + frac)

                    iterations += 1
                    if iterations >= max_iterations:
                        writer.close()
                        return


def _evaluate(trainer, state, test_loader, di_b, Evaluation, color_idx,
              bones, image_dir):
    """Reconstruction-error eval (pose_train.py:143-182): decode(mu) on
    test poses, mm error against gt, skeleton grid image."""
    gt3d, joints = [], []
    img2sav = None
    shown = 0
    if not hasattr(trainer, "_eval_recon_jit"):
        # decode(mu): deterministic reconstruction (pose_train.py:155)
        trainer._eval_recon_jit = jax.jit(
            lambda p, y: trainer.vae.decode(p, trainer.vae.encode(p, y)[1]))
    for batch in test_loader:
        imgs, labels, com, trans, cube = batch[:5]
        pred = np.asarray(trainer._eval_recon_jit(
            state["params"]["vae"], jnp.asarray(labels)))
        n = labels.shape[0]
        for i in range(n):
            gt3d.append(labels[i].reshape(-1, 3) * (cube[i, 0] / 2.0)
                        + com[i])
            joints.append(pred[i].reshape(-1, 3) * (cube[i, 0] / 2.0)
                          + com[i])
        if shown < 8:
            real = viz.vis_pair(di_b.camera, imgs[0], labels[0], trans[0],
                                com[0], cube[0], color_idx, bones)
            est = viz.vis_pair(di_b.camera, imgs[0], pred[0], trans[0],
                               com[0], cube[0], color_idx, bones)
            col = np.vstack((real, est))
            img2sav = col if img2sav is None else np.hstack((img2sav, col))
            shown += 1
    import cv2

    if img2sav is not None:
        cv2.imwrite(os.path.join(image_dir, "_test.jpg"),
                    img2sav.astype("uint8"))
    hpe = Evaluation(np.array(gt3d), np.array(joints))
    print(f"Mean error: {hpe.getMeanError()}mm, "
          f"max error: {hpe.getMaxError()}mm")
    return hpe


if __name__ == "__main__":
    main(sys.argv[1:])
