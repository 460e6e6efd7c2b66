"""Depth training CLI (README steps 2-3).

Reference loop: src/depth_train.py:63-265 — two modes:

* ``--mode pretrain``: adversarial dual-domain VAE-GAN, alternating
  ``dis_update`` + ``gen_update`` per iteration (batch 1, like UNIT;
  override with ``--batch-size`` for TPU efficiency).
* ``--mode estimateN`` (N in 0/1/3/4/5): posterior-regression training
  via ``post_update``, with periodic test-set eval (mean mm error, %
  frames within 40 mm, gen.avi video, _test.jpg grid).

Usage: ``python -m lsps_tpu.cli.depth_train --config exps/nnyu.yaml
--mode pretrain``; then ``--mode estimate3 --frac 0.1``.
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
from lsps_tpu.eval.handpose_evaluation import NYU_RESTRICTED_EVAL
from lsps_tpu.utils import viz
from lsps_tpu.utils.logging import (MetricsWriter,
                                    prepare_snapshot_and_image_folder,
                                    profile_trace, write_loss, write_html)

MAX_EPOCHS = 100000

# GAN-basin health lives in train/gan_health.py (advisory + online
# collapse guard); the constant is re-exported here so operators (and
# tests) can retune the threshold at the CLI module.
from lsps_tpu.train.gan_health import (COLLAPSE_CHECK_ITER,  # noqa: E402
                                       FAKE_ACC_DOMINANT,
                                       RESEED_WINDOW_FRAC, CollapseGuard,
                                       RescueController, gan_health_note,
                                       overfit_note)


def main(argv=None):
    parser = C.base_parser("LSPS-TPU depth VAE-GAN / estimation training")
    parser.add_argument("--mode", type=str, required=True,
                        help="pretrain | estimate{0,1,3,4,5}")
    parser.add_argument("--idx", type=int, default=-1,
                        help="pretrain checkpoint index to load")
    parser.add_argument("--reseed-on-collapse", type=int, default=0,
                        metavar="N",
                        help="pretrain only: if the collapse guard "
                        "detects a discriminator-dominant basin, abort "
                        "and restart with a fresh seed, up to N times "
                        "(default 0 = advisory only)")
    parser.add_argument("--collapse-check-iter", type=int,
                        default=COLLAPSE_CHECK_ITER,
                        help="iteration from which the collapse guard "
                        "may trigger")
    parser.add_argument("--collapse-reseed-until", type=float,
                        default=RESEED_WINDOW_FRAC, metavar="FRAC",
                        help="reseed only when the guard triggers within "
                        "the first FRAC of the schedule; later triggers "
                        "stay advisory (late borderline dominance is "
                        "measured-benign, docs/BENCHMARKS.md)")
    parser.add_argument("--rescue-on-collapse", type=int, default=0,
                        metavar="N",
                        help="pretrain only: when the collapse guard "
                        "triggers in the early window, FREEZE the "
                        "discriminator and run generator-only updates "
                        "for --rescue-iters iterations (up to N rescue "
                        "phases) before falling back to the reseed/"
                        "advisory action.  Tried BEFORE a reseed when "
                        "both budgets are given (default 0 = off; the "
                        "parity alternation is untouched)")
    parser.add_argument("--rescue-iters", type=int, default=500,
                        metavar="K",
                        help="length of one generator-only rescue phase")
    opts = parser.parse_args(argv)

    attempts = max(0, opts.reseed_on_collapse) + 1
    for attempt in range(attempts):
        # fresh deterministic seed per attempt (9973 is just a prime
        # stride; any attempt-distinct fold works)
        seed = opts.seed + 9973 * attempt
        if attempt:
            print(f"collapse guard: restarting pretrain with seed {seed} "
                  f"(attempt {attempt + 1}/{attempts})")
        guard = _run(opts, seed, can_reseed=attempt + 1 < attempts,
                     is_restart=attempt > 0)
        if guard is None:
            return
        print(f"collapse guard: pretrain aborted at iteration "
              f"{guard.triggered_at} (windowed fake acc "
              f"{guard.triggered_fake:.2f} >= {guard.threshold:.2f})")
        # Release the aborted attempt's compiled programs and device
        # buffers before restarting: each full-size attempt holds tens
        # of GB of host RAM on this platform, and three attempts in one
        # process OOM-killed a 125 GB host (round-4 hardware rescue
        # chain).  The persistent XLA cache makes the recompile cheap.
        import gc
        jax.clear_caches()
        gc.collect()


def _discard_attempt_snapshots(orbax_store, attempt_snaps, attempt_orbax):
    """Delete the snapshots a guard-aborted pretrain attempt saved.

    The aborted attempt's weights are a collapsed basin being abandoned;
    leaving them on disk would poison both the in-process reseed (if it
    passed ``--resume 1``) and any later resume of this experiment.
    Only files written by this attempt are touched."""
    import shutil

    nets = ("gen", "dis", "map", "optg", "optd")
    for prefix, it in attempt_snaps:
        for net in nets:
            path = f"{prefix}_{net}_{it:08d}.npz"
            if os.path.exists(path):
                os.remove(path)
    if orbax_store is not None and attempt_orbax:
        orbax_store.wait()  # join in-flight async writes first
        for step in attempt_orbax:
            path = os.path.join(orbax_store.directory,
                                f"state_{step:08d}")
            if os.path.isdir(path):
                shutil.rmtree(path)
    if attempt_snaps or attempt_orbax:
        print(f"collapse guard: discarded {len(attempt_snaps)} snapshot "
              f"set(s) and {len(attempt_orbax)} orbax step(s) saved by "
              f"the aborted attempt")


def _run(opts, seed, can_reseed=False, is_restart=False):
    """One full training run.  Returns None on completion; in pretrain
    with ``can_reseed`` the run aborts and returns its CollapseGuard as
    soon as the guard detects the discriminator-dominant basin.

    ``is_restart`` marks a collapse-guard reseed attempt: the
    ``--resume 1`` snapshot restore is skipped (resuming would reload
    the aborted attempt's collapsed weights and defeat the fresh seed),
    and the aborted attempt deletes the snapshots it saved so a later
    resume cannot pick up the abandoned basin either."""
    estimate = "estimate" in opts.mode
    mode_idx = int(opts.mode[-1]) if estimate else -1

    Evaluation, color_idx, bones = C.select_eval(opts.config)
    config = C.load_experiment(opts)
    hyp = config.hyperparameters

    # batch sizes (depth_train.py:85-86): estimate uses config batch size,
    # pretrain uses 1 (UNIT-style); --batch-size overrides both.
    batch_size = opts.batch_size or (hyp["batch_size"] if estimate else 1)
    test_batch_size = batch_size * 32
    max_iterations = hyp["max_iterations"]
    frac = opts.frac

    dataset_a, dataset_b, dataset_test = C.make_datasets(config)
    trainer = C.make_trainer(config,
                             sch_interval=opts.sch_interval
                             or (100 if estimate else 1000))
    state = trainer.init_state(jax.random.PRNGKey(seed))
    di_b = dataset_b.di

    # optional preemption-safe async full-state checkpointing
    orbax_store = None
    if opts.orbax_dir:
        from lsps_tpu.train.checkpoint import OrbaxStateStore

        orbax_store = OrbaxStateStore(opts.orbax_dir)

    iterations = 0
    if opts.resume == 1 and is_restart:
        print("collapse guard: skipping --resume restore on the reseed "
              "attempt (a fresh basin must start from fresh weights)")
    if opts.resume == 1 and not is_restart:
        if orbax_store is not None and orbax_store.latest_step() is not None:
            state, iterations = orbax_store.restore(state)
            print(f"Resumed full state from orbax step {iterations}")
        else:
            state, iterations = trainer.resume(state,
                                               config.snapshot_prefix,
                                               idx=-1, load_opt=True)
        # LR schedules are pure functions of the step count; no replay
        # needed (cf. depth_train.py:111-113)

    # VAE checkpoint is a hard dependency of estimate3/4
    # (depth_train.py:118-124)
    try:
        vae_frac = 2 + frac if (estimate and mode_idx in (3, 4)) else frac
        state, ok = trainer.load_vae(state, config.snapshot_prefix, vae_frac)
        if not ok:
            print("Failed to load the parameters of vae")
    except Exception as e:
        print(f"Failed to load the parameters of vae ({e})")

    if estimate:
        if opts.idx != 0:
            state, _ = trainer.resume(state, config.snapshot_prefix,
                                      idx=opts.idx, est=mode_idx == 5)
        if 0.0 < frac < 1.0:
            dataset_b.set_nmax(frac)

    loader_a = get_data_loader(dataset_a, batch_size, shuffle=True,
                               seed=seed)
    loader_b = get_data_loader(dataset_b, batch_size, shuffle=True,
                               seed=seed + 1)
    test_loader = get_data_loader(dataset_test, test_batch_size,
                                  shuffle=False)

    writer = MetricsWriter(os.path.join(
        opts.log, os.path.splitext(os.path.basename(opts.config))[0]))
    image_dir, snap_dir = prepare_snapshot_and_image_folder(
        config.snapshot_prefix, iterations, config.image_save_iterations)

    if min(len(dataset_a), len(dataset_b)) < batch_size:
        raise ValueError(
            f"batch_size {batch_size} exceeds dataset sizes "
            f"({len(dataset_a)}, {len(dataset_b)}); every batch would be "
            "skipped (cf. reference depth_train.py:143-144)")

    # data-parallel path (--mesh-data): replicate the state over the
    # mesh AFTER all checkpoint loads, pjit the step with the batch
    # sharded over the data axis (SURVEY §2.8; the loop being scaled is
    # the reference's depth_train.py:140-166)
    # fused-in-step augmentation (LSPS_AUGMENT=step): the loader yields
    # warp params; the image chain runs inside the training program
    raw_a = bool(getattr(loader_a, "raw", False))
    raw_b = bool(getattr(loader_b, "raw", False))
    if raw_a != raw_b:
        # asymmetric augment flags: one dataset declined the 'step'
        # backend, so its loader yields images — the other must too
        # (the step functions consume either two raw 7-tuples or two
        # image batches, never a mix)
        (loader_a if raw_a else loader_b).disable_raw()
        print("LSPS_AUGMENT=step: only one train dataset supports "
              "fused-in-step augmentation; using in-loader augmented "
              "images for both")
    raw_mode = raw_a and raw_b
    if raw_mode:
        print("augmentation fused into the training step "
              "(LSPS_AUGMENT=step)")

    mesh_runner = C.make_mesh_runner(opts)
    step_fns = None
    if mesh_runner is not None:
        mesh_runner.check_batch(batch_size)
        state = mesh_runner.shard_state(state)
        if not estimate:
            base = (trainer._pretrain_update_raw if raw_mode
                    else trainer._pretrain_update)

            def _mk_step(v, _u=base):
                def _f(s, ia, la, ib, lb, r):
                    return _u(s, ia, la, ib, lb, r, with_viz=v)
                return mesh_runner.wrap(_f, 4)
        else:
            base = (trainer._post_update_raw if raw_mode
                    else trainer._post_update)

            def _mk_step(v, _u=base):
                def _f(s, ia, la, ib, lb, r):
                    return _u(s, ia, la, ib, lb, r, mode=mode_idx,
                              with_viz=v)
                return mesh_runner.wrap(_f, 4)

        # two pjit variants: ordinary steps drop the viz outputs (the
        # panels cost ~10 ms/step of output-layout work, see
        # trainer._pretrain_update); cadence steps use the full program
        step_fns = {True: _mk_step(True), False: _mk_step(False)}
        print(f"data-parallel over {mesh_runner.n_data} devices "
              f"(global batch {batch_size * 2} images/step)")

    # multi-step dispatch (--steps-per-call K): scan K pre-staged
    # batches per XLA program (trainer.pretrain_scan/post_scan) to
    # amortize per-dispatch host/H2D overhead K-fold.  The scan carries
    # the last step's outputs, so image/snapshot cadences may land
    # exactly on a chunk boundary; near a boundary that K doesn't
    # divide, the loop falls back to single steps until re-aligned.
    # default (0 = auto) resolves to the classic single-step loop: the
    # large depth steps measured a latency LOSS under scan on this
    # platform (chunk staging > dispatch savings, docs/BENCHMARKS.md)
    steps_per_call = C.resolve_steps_per_call(opts, auto=1)
    scan_fns = None
    if steps_per_call > 1 and mesh_runner is not None:
        # mesh + scan: stacked (K, B, ...) batches shard on axis 1
        # (batch) over ``data``; the K steps scan sequentially on every
        # device with one gradient all-reduce per scanned step
        if not estimate:
            def _mk_scan(v, _u=trainer._pretrain_scan, _raw=raw_mode):
                def _f(s, xa, la, xb, lb, keys):
                    return _u(s, xa, la, xb, lb, keys, raw=_raw,
                              with_viz=v)
                return mesh_runner.wrap(_f, 4, batch_axis=1)
        else:
            def _mk_scan(v, _u=trainer._post_scan, _raw=raw_mode,
                         _m=mode_idx):
                def _f(s, xa, la, xb, lb, keys):
                    return _u(s, xa, la, xb, lb, keys, raw=_raw, mode=_m,
                              with_viz=v)
                return mesh_runner.wrap(_f, 4, batch_axis=1)

        scan_fns = {True: _mk_scan(True), False: _mk_scan(False)}
    chunk_cadences = (config.image_display_iterations,
                      config.image_save_iterations,
                      config.snapshot_save_iterations)

    def stack_inputs(items):
        """Stack per-step inputs to a leading K axis (component-wise for
        the raw-mode warp-param 7-tuples)."""
        if isinstance(items[0], tuple):
            return tuple(np.stack([it[i] for it in items])
                         for i in range(len(items[0])))
        return np.stack(items)

    print(f"using {frac:.2f} percent of the labeled real data")
    best_err, best_acc = 100.0, 0.0
    # the guard's window doubles as the gan_health_note acc tail; its
    # abort action is gated on can_reseed at the trigger site below
    guard = None if estimate else CollapseGuard(
        threshold=FAKE_ACC_DOMINANT,
        check_iter=opts.collapse_check_iter)
    rescue = None
    if not estimate and opts.rescue_on_collapse > 0:
        if mesh_runner is not None or steps_per_call > 1:
            print("collapse rescue: --rescue-on-collapse requires the "
                  "single-device single-step loop (gen-only phases "
                  "switch the update per iteration); ignoring")
        else:
            rescue = RescueController(opts.rescue_on_collapse,
                                      phase_iters=opts.rescue_iters)
    err_history = []  # (iteration, mean mm err) per eval, overfit_note
    # snapshots written by THIS attempt — deleted if the guard aborts it,
    # so neither the in-process reseed nor a later --resume 1 can pick
    # up the abandoned collapsed basin
    attempt_snaps = []  # (prefix, it) pairs
    attempt_orbax = []  # orbax step numbers
    rng = jax.random.PRNGKey(seed + 13)
    start = time.time()
    pending = []
    n_plan = 0
    with profile_trace(opts.profile_dir):
        for ep in range(MAX_EPOCHS):
            for batch_a, batch_b in zip(iter(loader_a), iter(loader_b)):
                in_a, labels_a = batch_a[0], batch_a[1]
                in_b, labels_b = batch_b[0], batch_b[1]
                if (labels_a.shape[0] != batch_size
                        or labels_b.shape[0] != batch_size):
                    continue
                if not raw_mode:
                    # NCHW (1,H,W) sample layout -> NHWC device layout
                    in_a = np.transpose(in_a, (0, 2, 3, 1))
                    in_b = np.transpose(in_b, (0, 2, 3, 1))

                host_mets = mets = None
                scanned = False
                if steps_per_call > 1:
                    if not pending:
                        n_plan = C.chunk_len(iterations, steps_per_call,
                                             chunk_cadences,
                                             max_iterations)
                    if n_plan == steps_per_call:
                        pending.append((in_a, labels_a, in_b, labels_b))
                        if len(pending) < n_plan:
                            continue
                        xs_a = stack_inputs([p[0] for p in pending])
                        xs_b = stack_inputs([p[2] for p in pending])
                        ls_a = np.stack([p[1] for p in pending])
                        ls_b = np.stack([p[3] for p in pending])
                        keys, rng = C.fold_chain(rng, iterations, n_plan)
                        # viz outputs only if the chunk ENDS on an image
                        # cadence (chunk_len guarantees no mid-chunk one)
                        end = iterations + n_plan
                        need_viz = (
                            end % config.image_display_iterations == 0
                            or end % config.image_save_iterations == 0)
                        if scan_fns is not None:
                            state, mets, outs = scan_fns[need_viz](
                                state, xs_a, ls_a, xs_b, ls_b, keys)
                        elif not estimate:
                            state, mets, outs = trainer.pretrain_scan(
                                state, xs_a, ls_a, xs_b, ls_b, keys,
                                raw=raw_mode, with_viz=need_viz)
                        else:
                            state, mets, outs = trainer.post_scan(
                                state, xs_a, ls_a, xs_b, ls_b, keys,
                                raw=raw_mode, mode=mode_idx,
                                with_viz=need_viz)
                        if not need_viz:
                            images_a = images_b = None
                        elif raw_mode:
                            # last step's augmented images (viz strip)
                            outs, images_a, images_b = outs
                        else:
                            images_a = pending[-1][0]
                            images_b = pending[-1][2]
                        pending = []
                        n_done = n_plan
                        scanned = True

                if not scanned:
                    n_done = 1
                    if raw_mode:
                        # in_* are 7-tuples of warp params (leading B)
                        if mesh_runner is not None:
                            in_a = mesh_runner.place(*in_a)
                            in_b = mesh_runner.place(*in_b)
                            labels_a, labels_b = mesh_runner.place(
                                labels_a, labels_b)
                    else:
                        if mesh_runner is not None:
                            in_a, labels_a, in_b, labels_b = \
                                mesh_runner.place(in_a, labels_a, in_b,
                                                  labels_b)
                        else:
                            in_a = jnp.asarray(in_a)
                            in_b = jnp.asarray(in_b)
                            labels_a = jnp.asarray(labels_a)
                            labels_b = jnp.asarray(labels_b)

                    rng = C.host_fold_in(rng, iterations)
                    # viz outputs only on image cadences — ordinary
                    # steps run the variant whose program XLA strips of
                    # the ~10 ms/step of panel/output-layout work
                    need_viz = (
                        (iterations + 1) % config.image_display_iterations
                        == 0
                        or (iterations + 1) % config.image_save_iterations
                        == 0)
                    if step_fns is not None:
                        state, metrics, outs = step_fns[need_viz](
                            state, in_a, labels_a, in_b, labels_b, rng)
                    elif (rescue is not None
                          and rescue.in_phase(iterations + 1)):
                        # collapse-rescue phase: generator-only step,
                        # the discriminator is frozen (its params AND
                        # Adam moments untouched — gen_update only
                        # writes the gen/map slots)
                        if raw_mode:
                            state, metrics, outs = trainer.gen_update_raw(
                                state, in_a, labels_a, in_b, labels_b,
                                rng, with_viz=need_viz)
                        else:
                            state, metrics, outs = trainer.gen_update(
                                state, in_a, labels_a, in_b, labels_b,
                                rng)
                    elif raw_mode and not estimate:
                        state, metrics, outs = trainer.pretrain_update_raw(
                            state, in_a, labels_a, in_b, labels_b, rng,
                            with_viz=need_viz)
                    elif raw_mode:
                        state, metrics, outs = trainer.post_update_raw(
                            state, in_a, labels_a, in_b, labels_b, rng,
                            mode=mode_idx, with_viz=need_viz)
                    elif not estimate:
                        # one fused XLA program per iteration (dis then
                        # gen); the reference dispatches two
                        # (depth_train.py:153-161)
                        state, metrics, outs = trainer.pretrain_update(
                            state, in_a, labels_a, in_b, labels_b, rng,
                            with_viz=need_viz)
                    else:
                        state, metrics, outs = trainer.post_update(
                            state, in_a, labels_a, in_b, labels_b, rng,
                            mode=mode_idx, with_viz=need_viz)
                    if not need_viz:
                        images_a = images_b = None
                    elif raw_mode:
                        # raw updates also return the augmented images
                        # (needed for the viz strip on cadences)
                        outs, images_a, images_b = outs
                    else:
                        images_a, images_b = in_a, in_b

                for j in range(n_done):
                    # the 10-panel strip is only consumed on the image
                    # cadences — assembling it is an extra XLA dispatch,
                    # so skip it on ordinary steps (host dispatch
                    # dominates small-batch step time on this platform).
                    # In a scanned chunk an image cadence can only land
                    # on the LAST step (chunk_len), where images/outs
                    # hold that step's values.
                    if ((iterations + 1) % config.image_display_iterations
                            == 0
                            or (iterations + 1)
                            % config.image_save_iterations == 0):
                        assembled = trainer.assemble_outputs(
                            images_a, images_b, outs)
                    else:
                        assembled = None

                    if (iterations + 1) % config.display == 0:
                        if mets is not None:
                            if host_mets is None:
                                host_mets = jax.device_get(mets)
                            step_metrics = {k: v[j]
                                            for k, v in host_mets.items()}
                        else:
                            step_metrics = metrics
                        write_loss(iterations, max_iterations,
                                   step_metrics, writer,
                                   time.time() - start)
                        start = time.time()
                        if (guard is not None
                                and "dis_fake_acc" in step_metrics
                                and guard.observe(
                                    iterations + 1,
                                    float(step_metrics["dis_true_acc"]),
                                    float(step_metrics["dis_fake_acc"]))):
                            msg = (f"collapse guard: discriminator-"
                                   f"dominant basin detected at "
                                   f"iteration {iterations + 1} "
                                   f"(windowed fake acc "
                                   f"{guard.triggered_fake:.2f})")
                            in_window = ((iterations + 1) <=
                                         opts.collapse_reseed_until
                                         * max_iterations)
                            if (rescue is not None
                                    and not rescue.exhausted
                                    and in_window):
                                end = rescue.start(guard, iterations + 1)
                                print(msg + f"; rescue phase "
                                      f"{rescue.phases_used}/"
                                      f"{rescue.budget}: freezing the "
                                      f"discriminator for gen-only "
                                      f"updates through iteration {end}")
                            elif can_reseed and in_window:
                                print(msg)
                                writer.close()
                                _discard_attempt_snapshots(
                                    orbax_store, attempt_snaps,
                                    attempt_orbax)
                                return guard
                            elif can_reseed:
                                print(msg + "; continuing (past the "
                                      "reseed window at "
                                      f"{(iterations + 1) / max_iterations:.0%}"
                                      " of schedule — late borderline "
                                      "dominance is measured-benign, "
                                      "docs/BENCHMARKS.md)")
                            else:
                                print(msg + "; continuing (no "
                                      "--reseed-on-collapse budget)")

                    if (iterations + 1) % config.image_display_iterations \
                            == 0:
                        viz.save_image_strip(
                            assembled, os.path.join(image_dir, "gen.jpg"))

                    if (iterations + 1) % config.image_save_iterations == 0:
                        if not estimate:
                            viz.save_image_strip(
                                assembled,
                                os.path.join(
                                    image_dir,
                                    f"gen_{iterations + 1:08d}.jpg"))
                            write_html(os.path.join(snap_dir, "index.html"),
                                       iterations + 1,
                                       config.image_save_iterations,
                                       image_dir)
                        else:
                            err, acc = evaluate_estimation(
                                trainer, state, test_loader, di_b,
                                Evaluation, color_idx, bones, image_dir,
                                mode_idx, "nyu" in opts.config,
                                mesh_runner=mesh_runner)
                            best_err = min(best_err, err)
                            best_acc = max(best_acc, acc)
                            err_history.append((iterations + 1, err))
                            print(f"------------ Mean err: {err:.4f} "
                                  f"({best_err:.4f}) mm, Max over 40mm: "
                                  f"{acc:.2f} ({best_acc:.2f}) %")

                    if (iterations + 1) % config.snapshot_save_iterations \
                            == 0:
                        prefix = (config.snapshot_prefix + "_est"
                                  if estimate else config.snapshot_prefix)
                        trainer.save(state, prefix, iterations)
                        attempt_snaps.append((prefix, iterations + 1))
                        if orbax_store is not None:
                            orbax_store.save(state, iterations + 1)
                            attempt_orbax.append(iterations + 1)

                    iterations += 1
                    if iterations >= max_iterations:
                        writer.close()
                        note = (overfit_note(err_history) if estimate
                                else gan_health_note(
                                    guard.tail,
                                    threshold=FAKE_ACC_DOMINANT))
                        if note:
                            print(note)
                        return None


def evaluate_estimation(trainer, state, test_loader, di_b, Evaluation,
                        color_idx, bones, image_dir, mode_idx,
                        nyu_protocol, mesh_runner=None):
    """Test-set eval (depth_train.py:185-253): regress posterior ->
    decode pose -> mm metrics + video/grid artifacts.  Under a mesh the
    test batch shards over the data axis (padded to a multiple of the
    mesh size) and the predictions gather back to the host — the
    sharded eval join of SURVEY §2.8."""
    import cv2

    gt3d, joints = [], []
    img2sav = None
    vid = viz.EvalVideoWriter(os.path.join(image_dir, "gen.avi"))
    params = state["params"]

    # build the eval jits once per process (fresh lambdas would retrace
    # on every eval); mesh and single-device variants cached separately
    cache_key = "_eval_jits_mesh" if mesh_runner is not None \
        else "_eval_jits"
    if not hasattr(trainer, cache_key):
        kwargs = {}
        if mesh_runner is not None:
            from lsps_tpu.parallel.mesh import batch_sharding, replicated

            rep = replicated(mesh_runner.mesh)
            bsh = batch_sharding(mesh_runner.mesh)
            kwargs = {"in_shardings": (rep, bsh)}
        setattr(trainer, cache_key, {
            "regress_a": jax.jit(
                lambda p, x: trainer.dis.regress_a(p["dis"], x), **kwargs),
            "regress_b": jax.jit(
                lambda p, x: trainer.dis.regress_b(p["dis"], x), **kwargs),
            "decode": jax.jit(lambda p, z: trainer.vae.decode(p["vae"], z),
                              **kwargs),
        })
    jits = getattr(trainer, cache_key)
    regress = jits["regress_a" if mode_idx == 0 else "regress_b"]
    decode = jits["decode"]

    first_dpt_mm = first_trans = None
    for tit, batch in enumerate(iter(test_loader)):
        imgs, labels, com, trans, cube = batch[:5]
        if tit == 0:
            # stash the first frame's metric-mm depth crop for the 3D
            # point-cloud artifact (normalize inverse of
            # dataset_hand2.py:27-31; background -> 0 so depth_to_pcl
            # drops it)
            from lsps_tpu.data.augment import denormalize

            d = np.asarray(imgs[0, 0], np.float32)
            mm = denormalize(d, np.asarray(com[0]), np.asarray(cube[0]))
            mm[d >= 0.99] = 0.0
            first_dpt_mm, first_trans = mm, np.asarray(trans[0])
        x = np.transpose(imgs, (0, 2, 3, 1))
        if mesh_runner is not None:
            (x,), n_valid = mesh_runner.place_padded(x)
        else:
            x, n_valid = jnp.asarray(x), x.shape[0]
        _, post, _ = regress(params, x)
        pred = np.asarray(decode(params, post))[:n_valid]

        n = labels.shape[0]
        gt_pose = labels.reshape(n, -1, 3)
        pr_pose = pred.reshape(n, -1, 3)

        if tit < 20:
            for i in range(0, n, 4):
                real = viz.vis_pair(di_b.camera, imgs[i],
                                    gt_pose[i].reshape(-1), trans[i],
                                    com[i], cube[i], color_idx, bones)
                est = viz.vis_pair(di_b.camera, imgs[i],
                                   pr_pose[i].reshape(-1), trans[i],
                                   com[i], cube[i], color_idx, bones)
                vid.write_pair(real, est)
            if tit < 8:
                col = np.vstack((real, est))
                img2sav = col if img2sav is None else np.hstack(
                    (img2sav, col))

        if nyu_protocol:  # 14-joint protocol (depth_train.py:231-234)
            gt_pose = gt_pose[:, NYU_RESTRICTED_EVAL]
            pr_pose = pr_pose[:, NYU_RESTRICTED_EVAL]
        for i in range(n):
            gt3d.append(gt_pose[i] * (cube[i, 0] / 2.0) + com[i])
            joints.append(pr_pose[i] * (cube[i, 0] / 2.0) + com[i])

    if img2sav is not None:
        cv2.imwrite(os.path.join(image_dir, "_test.jpg"),
                    img2sav.astype("uint8"))
    vid.release()

    hpe = Evaluation(np.array(gt3d), np.array(joints))
    mean_err = hpe.getMeanError()
    over_40 = 100.0 * hpe.getNumFramesWithinMaxDist(40) / len(gt3d)

    # 3D point-cloud + skeleton artifact for the first test frame
    # (reference plotResult3D, handpose_evaluation.py:488-620)
    if first_dpt_mm is not None:
        hpe.subfolder = image_dir
        try:
            hpe.plotResult3D(first_dpt_mm, first_trans, gt3d[0], joints[0],
                             filename="_test3d", camera=di_b.camera,
                             niceColors=True)
        except Exception as e:
            print(f"3D plot skipped: {e}")
    return mean_err, over_40


if __name__ == "__main__":
    main(sys.argv[1:])
