"""LSPS trainer: the four update rules as jitted pure functions.

Reference: src/trainers/lsps_trainer.py.  The reference mutates four
nn.Modules and three torch optimizers in-place; here the whole training
state (4 param trees + 3 optax states + step) is one pytree and each
update is a pure ``(state, batch, rng) -> (state, metrics, outputs)``
function compiled once by XLA.  Loss weighting, optimizer grouping
(gen+map share one Adam, lsps_trainer.py:27-28) and metric names match
the reference exactly.

Data parallelism: updates are pjit-friendly — batch-mean losses make
gradients correct under GSPMD-sharded batches with no explicit
collectives; an optional ``axis_name`` adds ``lax.pmean`` for
shard_map/pmap use.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from lsps_tpu.models import build_model
from lsps_tpu.train import optim
from lsps_tpu.train.checkpoint import CheckpointManager
from lsps_tpu.registry import register

Pytree = Any


# ---------------------------------------------------------------------------
# losses (lsps_trainer.py:48-60)
# ---------------------------------------------------------------------------

def _f32(x):
    """Loss inputs accumulate in at least f32: bf16 activations are
    promoted to f32 (the bf16 training mode keeps convs in bf16 but
    reductions in f32); f32 stays f32; f64 stays f64 so the x64
    lockstep-trajectory oracle (tests/test_reference_trajectory_parity
    .py) compares genuine float64 trajectories."""
    x = jnp.asarray(x)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        return x.astype(jnp.float32)
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def l1_loss(a, b):
    """torch.nn.L1Loss (mean reduction) — lsps_trainer.py:42-49."""
    return jnp.mean(jnp.abs(_f32(a) - _f32(b)))


def l2_loss(a, b):
    """Elementwise MSE mean — lsps_trainer.py:51-52."""
    return jnp.mean(jnp.square(_f32(a) - _f32(b)))


def kl_loss(mu, sd=None):
    """KL terms (lsps_trainer.py:55-60): with sd,
    sum(mu^2 + sd^2 - log sd^2)/B; without, mean(mu^2)."""
    mu2 = jnp.square(_f32(mu))
    if sd is None:
        return jnp.mean(mu2)
    sd2 = jnp.square(_f32(sd))
    return jnp.sum(mu2 + sd2 - jnp.log(sd2)) / mu.shape[0]


def bce_logits_vs_ones(logits):
    """BCE(sigmoid(x), 1) in stable logit form."""
    return jnp.mean(jax.nn.softplus(-_f32(logits)))


def bce_logits_vs_zeros(logits):
    """BCE(sigmoid(x), 0) in stable logit form."""
    return jnp.mean(jax.nn.softplus(_f32(logits)))


def true_acc(logits):
    """Fraction classified real (sigmoid >= 0.5) — helpers.py:20-25."""
    return jnp.mean((logits >= 0.0).astype(jnp.float32))


def fake_acc(logits):
    """Fraction classified fake (sigmoid <= 0.5) — helpers.py:27-32."""
    return jnp.mean((logits <= 0.0).astype(jnp.float32))


def zeroed_subtrees(tree, names):
    """Decay-reference tree with the named top-level subtrees zeroed.

    torch's Adam skips params whose ``.grad`` is None: a net/head that
    is unreachable in an update's loss graph receives NO weight decay
    and NO moment updates in the reference.  Our jitted updates always
    differentiate the full param tree (unreachable heads just get
    exactly-zero grads), so zeroing those heads in the tree passed to
    ``add_decayed_weights`` reproduces torch exactly: zero grad + zero
    decay -> Adam moments stay zero -> exactly-zero update.  Pinned by
    tests/test_reference_trajectory_parity.py.
    """
    out = dict(tree)
    for n in names:
        out[n] = jax.tree.map(jnp.zeros_like, tree[n])
    return out


def cast_tree(tree, dtype):
    """Cast all floating leaves of a pytree (params f32 at rest ->
    bf16 for compute; gradients flow back through the cast to f32)."""
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, tree)


# ---------------------------------------------------------------------------
class TrainState:
    """The full training state as a dict pytree (checkpoint-friendly)."""

    @staticmethod
    def create(params: Dict[str, Pytree], opt_states: Dict[str, Pytree],
               step: int = 0) -> Dict[str, Pytree]:
        return {"params": params, "opt": opt_states,
                "step": jnp.asarray(step, jnp.int32)}


@register("trainer", "LSPSTrainer")
class LSPSTrainer:
    """Owns the four nets + three optimizers; exposes jitted updates.

    ``sch_interval`` is the loop's scheduler cadence: 1000 in
    pretrain/pose modes, 100 in estimate modes (depth_train.py:154-164).
    """

    def __init__(self, hyperparameters: Dict[str, Any],
                 sch_interval: int = 1000, axis_name: Optional[str] = None,
                 donate: bool = False):
        """``donate=True`` lets XLA reuse the input state's buffers in
        place (halves peak HBM) — only safe when the caller threads the
        state linearly and never touches a pre-update state again (the
        CLI loops do; enable there)."""
        hyp = dict(hyperparameters)
        self.hyp = hyp
        self.axis_name = axis_name
        lr = hyp["lr"]

        self.dis = build_model(hyp["dis"])
        self.gen = build_model(hyp["gen"])
        self.vae = build_model(hyp["vae"])
        self.map = build_model(hyp["map"])

        self.dis_opt = optim.dis_optimizer(lr, sch_interval)
        self.gen_opt = optim.gen_optimizer(lr, sch_interval)
        self.vae_opt = optim.vae_optimizer(lr, sch_interval)
        # matching pure LR functions for observability: each update logs
        # the LR it used (reference logs none; the MultiStepLR milestones
        # at lsps_trainer.py:32-34 become directly visible in metrics)
        self._dis_lr = optim.multistep_lr(lr, optim.DIS_GEN_MILESTONES,
                                          optim.DIS_GEN_GAMMA,
                                          sch_interval)
        self._gen_lr = self._dis_lr
        self._vae_lr = optim.multistep_lr(lr * 10.0, optim.VAE_MILESTONES,
                                          optim.VAE_GAMMA, sch_interval)

        self.train_map = bool(hyp.get("train_map", False))
        self.ckpt = CheckpointManager()

        # mixed precision for the conv-heavy image updates: params and
        # optimizer state stay f32; generator/discriminator forwards run
        # in bf16 (MXU-native on TPU); losses/reductions accumulate in
        # f32 (see _f32 in the loss helpers).  Opt in with
        # `compute_dtype: bfloat16` in hyperparameters.  The pose-VAE
        # update stays f32 — a 108-d MLP gains nothing from bf16.
        cd = str(hyp.get("compute_dtype", "float32")).lower()
        if cd in ("bfloat16", "bf16"):
            self.compute_dtype = jnp.bfloat16
        elif cd in ("float32", "f32", "none"):
            self.compute_dtype = None
        else:
            raise ValueError(f"unsupported compute_dtype {cd!r}")

        # optional rematerialization of the generator forward: trades
        # recompute for activation memory so large batches fit HBM
        # (hyperparameter `remat: True`; no effect on values/grads)
        if hyp.get("remat", False):
            self._gen_fwd = jax.checkpoint(
                lambda gp, xa, xb, r: self.gen(gp, xa, xb, rng=r,
                                               train=True))
        else:
            self._gen_fwd = lambda gp, xa, xb, r: self.gen(
                gp, xa, xb, rng=r, train=True)

        # jit the update rules once
        dn = (0,) if donate else ()
        self.vae_update = jax.jit(self._vae_update, donate_argnums=dn)
        self.gen_update = jax.jit(self._gen_update, donate_argnums=dn)
        self.dis_update = jax.jit(self._dis_update, donate_argnums=dn,
                                  static_argnames=("feat_mat",))
        self.post_update = jax.jit(self._post_update, donate_argnums=dn,
                                   static_argnames=("mode", "with_viz"))
        self.pretrain_update = jax.jit(self._pretrain_update,
                                       donate_argnums=dn,
                                       static_argnames=("feat_mat",
                                                        "with_viz"))
        # fused-augment variants: augmentCrop's image chain runs inside
        # the same program (loader supplies warp params only)
        self.pretrain_update_raw = jax.jit(self._pretrain_update_raw,
                                           donate_argnums=dn,
                                           static_argnames=("feat_mat",
                                                            "with_viz"))
        self.gen_update_raw = jax.jit(self._gen_update_raw,
                                      donate_argnums=dn,
                                      static_argnames=("with_viz",))
        self.post_update_raw = jax.jit(self._post_update_raw,
                                       donate_argnums=dn,
                                       static_argnames=("mode",
                                                        "with_viz"))
        # multi-step scan variants: K steps per dispatch (see the
        # _scan_chunk section below)
        self.vae_scan = jax.jit(self._vae_scan, donate_argnums=dn)
        self.pretrain_scan = jax.jit(self._pretrain_scan,
                                     donate_argnums=dn,
                                     static_argnames=("raw", "feat_mat",
                                                      "with_viz"))
        self.post_scan = jax.jit(self._post_scan, donate_argnums=dn,
                                 static_argnames=("raw", "mode",
                                                  "with_viz"))

    # ------------------------------------------------------------------
    def init_state(self, key) -> Dict[str, Pytree]:
        kd, kg, kv, km = jax.random.split(key, 4)
        params = {
            "dis": self.dis.init(kd),
            "gen": self.gen.init(kg),
            "vae": self.vae.init(kv),
            "map": self.map.init(km),
        }
        opt_states = {
            "dis": self.dis_opt.init(params["dis"]),
            "gen": self.gen_opt.init({"gen": params["gen"],
                                      "map": params["map"]}),
            "vae": self.vae_opt.init(params["vae"]),
        }
        return TrainState.create(params, opt_states)

    def _maybe_pmean(self, grads):
        if self.axis_name is not None:
            return jax.lax.pmean(grads, self.axis_name)
        return grads

    # ------------------------------------------------------------------
    # VAE update (lsps_trainer.py:62-74)
    # ------------------------------------------------------------------
    def _vae_update(self, state, y, rng):
        hyp = self.hyp

        def loss_fn(vae_params):
            dec, z, mu, sd = self.vae(vae_params, y, rng=rng)
            enc_loss = kl_loss(mu, sd)
            ll_loss = l1_loss(dec, y)
            total = (hyp["kl_loss_vae"] * enc_loss
                     + hyp["ll_loss_vae"] * ll_loss)
            return total, (dec, enc_loss, ll_loss)

        (total, (dec, enc_loss, ll_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"]["vae"])
        grads = self._maybe_pmean(grads)
        updates, new_opt = self.vae_opt.update(grads, state["opt"]["vae"],
                                               state["params"]["vae"])
        new_vae = optax.apply_updates(state["params"]["vae"], updates)
        new_state = {
            "params": {**state["params"], "vae": new_vae},
            "opt": {**state["opt"], "vae": new_opt},
            "step": state["step"] + 1,
        }
        metrics = {"vae_total_loss": total, "vae_enc_loss": enc_loss,
                   "vae_ll_loss": ll_loss,
                   "vae_lr": self._vae_lr(state["opt"]["vae"][2].count)}
        return new_state, metrics, dec

    # ------------------------------------------------------------------
    # generator update (lsps_trainer.py:76-141)
    # ------------------------------------------------------------------
    def _gen_update(self, state, images_a, labels_a, images_b, labels_b,
                    rng):
        hyp = self.hyp
        cd = self.compute_dtype
        params = state["params"]
        r_fwd, r_bab, r_aba, r_vae = jax.random.split(rng, 4)
        xa = images_a if cd is None else images_a.astype(cd)
        xb = images_b if cd is None else images_b.astype(cd)
        dis_p = cast_tree(params["dis"], cd)

        def loss_fn(diff):
            gen_p = cast_tree(diff["gen"], cd)
            map_p = cast_tree(diff["map"], cd)
            x_aa, x_ba, x_ab, x_bb, shared = self._gen_fwd(
                gen_p, xa, xb, r_fwd)
            x_bab, shared_bab = self.gen.forward_a2b(gen_p, x_ba, rng=r_bab,
                                                     train=True)
            x_aba, shared_aba = self.gen.forward_b2a(gen_p, x_ab, rng=r_aba,
                                                     train=True)

            if self.train_map:
                labels = jnp.concatenate([labels_a, labels_b], 0)
                enc_pose, _, _ = self.vae.encode(params["vae"], labels,
                                                 rng=r_vae)
                if cd is not None:
                    enc_pose = enc_pose.astype(cd)
                z_p2d = self.map(map_p, enc_pose)
                dec_a_full, dec_b_full = self.gen.decode(gen_p, z_p2d)
                half = dec_a_full.shape[0] // 2
                decode_a = dec_a_full[:half]
                decode_b = dec_b_full[half:]
                data_a = jnp.concatenate([x_ba, decode_a], 0)
                data_b = jnp.concatenate([x_ab, decode_b], 0)
                matching_z = l2_loss(shared, z_p2d)
                matching_a = l1_loss(decode_a, images_a)
                matching_b = l1_loss(decode_b, images_b)
            else:
                data_a, decode_a = x_ba, x_ba
                data_b, decode_b = x_ab, x_ab
                matching_z = matching_a = matching_b = 0.0

            outs_a, outs_b, _, _ = self.dis(dis_p, data_a, data_b)
            ad_loss_a = bce_logits_vs_ones(outs_a)
            ad_loss_b = bce_logits_vs_ones(outs_b)

            enc_loss = kl_loss(shared)
            enc_bab = kl_loss(shared_bab)
            enc_aba = kl_loss(shared_aba)
            ll_a = l1_loss(x_aa, images_a)
            ll_b = l1_loss(x_bb, images_b)
            ll_aba = l1_loss(x_aba, images_a)
            ll_bab = l1_loss(x_bab, images_b)

            total = (hyp["gan_w"] * (ad_loss_a + ad_loss_b)
                     + hyp["ll_direct_link_w"] * (ll_a + ll_b)
                     + hyp["ll_cycle_link_w"] * (ll_aba + ll_bab)
                     + hyp["kl_direct_link_w"] * (enc_loss + enc_loss)
                     + hyp["kl_cycle_link_w"] * (enc_bab + enc_aba)
                     + hyp["ll_map_z_w"] * matching_z
                     + hyp["ll_map_w"] * (matching_a + matching_b))
            outs = (x_aa, x_ba, x_ab, x_bb, x_aba, x_bab, decode_a,
                    decode_b)
            if cd is not None:  # viz/host consumers expect f32
                outs = tuple(o.astype(jnp.float32) for o in outs)
            aux = {
                "images": outs,
                "gen_enc_loss": enc_loss,
                "gen_enc_loss2": enc_aba + enc_bab,
                "gen_ad_loss": ad_loss_a + ad_loss_b,
                "gen_ll_loss": ll_a + ll_b,
                "gen_ll_loss2": ll_bab + ll_aba,
                "gen_map_loss": matching_z,
                "gen_map_loss2": matching_a + matching_b,
                "gen_total_loss": total,
            }
            return total, aux

        diff = {"gen": params["gen"], "map": params["map"]}
        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(diff)
        grads = self._maybe_pmean(grads)
        # with train_map off the map net never participates
        # (lsps_trainer.py:84-104) -> no decay, no moments, no update
        # (see zeroed_subtrees)
        decay_ref = diff if self.train_map else zeroed_subtrees(
            diff, ("map",))
        updates, new_opt = self.gen_opt.update(grads, state["opt"]["gen"],
                                               decay_ref)
        new_diff = optax.apply_updates(diff, updates)
        new_state = {
            "params": {**params, "gen": new_diff["gen"],
                       "map": new_diff["map"]},
            "opt": {**state["opt"], "gen": new_opt},
            "step": state["step"],
        }
        images = aux.pop("images")
        aux["gen_lr"] = self._gen_lr(state["opt"]["gen"][2].count)
        return new_state, aux, images

    # ------------------------------------------------------------------
    # discriminator update (lsps_trainer.py:143-218)
    # ------------------------------------------------------------------
    def _dis_update(self, state, images_a, labels_a, images_b, labels_b,
                    rng, feat_mat: bool = True):
        hyp = self.hyp
        cd = self.compute_dtype
        params = state["params"]
        r_fwd, r_vae = jax.random.split(rng)
        xa = images_a if cd is None else images_a.astype(cd)
        xb = images_b if cd is None else images_b.astype(cd)
        gen_p = cast_tree(params["gen"], cd)

        # generator runs in train mode (noise on) but is frozen here
        x_aa, x_ba, x_ab, x_bb, shared = self._gen_fwd(gen_p, xa, xb,
                                                       r_fwd)

        if self.train_map:
            labels = jnp.concatenate([labels_a, labels_b], 0)
            enc_pose, _, _ = self.vae.encode(params["vae"], labels,
                                             rng=r_vae)
            if cd is not None:
                enc_pose = enc_pose.astype(cd)
            z_p2d = self.map(cast_tree(params["map"], cd), enc_pose)
            dec_a_full, dec_b_full = self.gen.decode(gen_p, z_p2d)
            half = dec_a_full.shape[0] // 2
            decode_a, decode_b = dec_a_full[:half], dec_b_full[half:]
            data_a = jnp.concatenate([xa, x_ba, x_aa, decode_a], 0)
            data_b = jnp.concatenate([xb, x_ab, x_bb, decode_b], 0)
            ndiv = 4
        elif feat_mat:
            data_a = jnp.concatenate([xa, x_ba, x_aa], 0)
            data_b = jnp.concatenate([xb, x_ab, x_bb], 0)
            ndiv = 3
        else:
            data_a = jnp.concatenate([xa, x_ba], 0)
            data_b = jnp.concatenate([xb, x_ab], 0)
            ndiv = 2

        def loss_fn(dis_params):
            res_a, res_b, feats_a, feats_b = self.dis(
                cast_tree(dis_params, cd), data_a, data_b)
            n = feats_a.shape[0] // ndiv

            feature_loss_a = feature_loss_b = 0.0
            if feat_mat:
                # x_ba features must match x_aa features across domains
                # (lsps_trainer.py:171-177)
                fa = [feats_a[i * n:(i + 1) * n] for i in range(ndiv)]
                fb = [feats_b[i * n:(i + 1) * n] for i in range(ndiv)]
                feature_loss_a = l1_loss(fb[1] - fa[2], 0.0)
                feature_loss_b = l1_loss(fa[1] - fb[2], 0.0)

            m = res_a.shape[0] // ndiv
            ra = [res_a[i * m:(i + 1) * m] for i in range(ndiv)]
            rb = [res_b[i * m:(i + 1) * m] for i in range(ndiv)]

            ad_true_a = bce_logits_vs_ones(ra[0])
            ad_true_b = bce_logits_vs_ones(rb[0])
            ad_fake_a = bce_logits_vs_zeros(ra[1])
            ad_fake_b = bce_logits_vs_zeros(rb[1])
            ad_dec_a = ad_dec_b = 0.0
            if self.train_map:
                ad_dec_a = bce_logits_vs_zeros(ra[3])
                ad_dec_b = bce_logits_vs_zeros(rb[3])

            ad_loss_a = ad_true_a + ad_fake_a + ad_dec_a
            ad_loss_b = ad_true_b + ad_fake_b + ad_dec_b
            loss = (hyp["gan_w"] * (ad_loss_a + ad_loss_b)
                    + hyp["feature_w"] * (feature_loss_a + feature_loss_b))
            aux = {
                "dis_ad_loss": ad_loss_a + ad_loss_b,
                "dis_feat_loss": feature_loss_a + feature_loss_b,
                "dis_loss": loss,
                "dis_true_acc": 0.5 * (true_acc(ra[0]) + true_acc(rb[0])),
                "dis_fake_acc": 0.5 * (fake_acc(ra[1]) + fake_acc(rb[1])),
                "dis_lr": self._dis_lr(state["opt"]["dis"][2].count),
            }
            return loss, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params["dis"])
        grads = self._maybe_pmean(grads)
        # the Post head is unreachable from the adversarial loss
        # (lsps_nets.py:154-160 uses model_A/B/S + D only) -> torch
        # leaves it untouched, decay included (see zeroed_subtrees)
        decay_ref = zeroed_subtrees(params["dis"], ("Post",))
        updates, new_opt = self.dis_opt.update(grads, state["opt"]["dis"],
                                               decay_ref)
        new_dis = optax.apply_updates(params["dis"], updates)
        new_state = {
            "params": {**params, "dis": new_dis},
            "opt": {**state["opt"], "dis": new_opt},
            "step": state["step"],
        }
        return new_state, aux, None

    # ------------------------------------------------------------------
    # fused pretrain iteration: dis_update then gen_update as ONE XLA
    # program.  The reference loop dispatches these as two separate
    # calls per iteration (src/depth_train.py:153-161); fusing them
    # halves per-step host dispatch and lets XLA overlap/share work.
    # Math is identical to dis_update(r1) followed by gen_update(r2)
    # with (r1, r2) = split(rng) — pinned by tests/test_trainer.py.
    # ------------------------------------------------------------------
    def _pretrain_update(self, state, images_a, labels_a, images_b,
                         labels_b, rng, feat_mat: bool = True,
                         with_viz: bool = True):
        r1, r2 = jax.random.split(rng)
        state, dmet, _ = self._dis_update(state, images_a, labels_a,
                                          images_b, labels_b, r1,
                                          feat_mat=feat_mat)
        state, gmet, outs = self._gen_update(state, images_a, labels_a,
                                             images_b, labels_b, r2)
        # with_viz=False drops the 10-panel viz tuple from the program
        # outputs.  The panels are only consumed on image cadences, yet
        # materializing them as outputs forces layout conversions into
        # XLA's linearized output form every step — measured ~10 ms of
        # the batch-32 step on v5e (the augment gather alone re-runs
        # serialized at 5.4 ms per domain when duplicated into the
        # f32[B*H*W]{T(1024)} output layout; docs/BENCHMARKS.md round-3).
        # The CLIs request viz only on cadence steps.
        return state, {**dmet, **gmet}, outs if with_viz else None

    # ------------------------------------------------------------------
    # fused-augment steps: the image half of augmentCrop (reference
    # dataset_hand2.py:34-119 — warp + nv/premax sentinels + z-clamp +
    # normalize) runs INSIDE the training program.  The host supplies
    # only raw cached crops + per-sample warp params (7 small arrays,
    # FastAugmenter.raw_batch), so each iteration stays ONE XLA dispatch
    # — this platform charges ~50 ms for any second program per step
    # (docs/BENCHMARKS.md).  Numerics = the 'jax' augment backend
    # (f32 coords, floor(+0.5) NN), parity pinned by the golden tests.
    # ------------------------------------------------------------------
    @staticmethod
    def _device_augment(raw):
        from lsps_tpu.data.augment_jax import (
            device_recrop_normalize_batch)

        imgs = device_recrop_normalize_batch(*raw)
        return imgs[..., None]  # (B, H, W) -> NHWC

    def _pretrain_update_raw(self, state, raw_a, labels_a, raw_b,
                             labels_b, rng, feat_mat: bool = True,
                             with_viz: bool = True):
        images_a = self._device_augment(raw_a)
        images_b = self._device_augment(raw_b)
        state, met, outs = self._pretrain_update(
            state, images_a, labels_a, images_b, labels_b, rng,
            feat_mat=feat_mat, with_viz=with_viz)
        if not with_viz:
            return state, met, None
        return state, met, (outs, images_a, images_b)

    def _gen_update_raw(self, state, raw_a, labels_a, raw_b, labels_b,
                        rng, with_viz: bool = True):
        """Generator-only fused-augment step (collapse-rescue phases:
        the dis is frozen, see cli/depth_train --rescue-on-collapse)."""
        images_a = self._device_augment(raw_a)
        images_b = self._device_augment(raw_b)
        state, met, outs = self._gen_update(
            state, images_a, labels_a, images_b, labels_b, rng)
        if not with_viz:
            return state, met, None
        return state, met, (outs, images_a, images_b)

    def _post_update_raw(self, state, raw_a, labels_a, raw_b, labels_b,
                         rng, mode: int = 3, with_viz: bool = True):
        images_a = self._device_augment(raw_a)
        images_b = self._device_augment(raw_b)
        state, met, outs = self._post_update(
            state, images_a, labels_a, images_b, labels_b, rng, mode=mode,
            with_viz=with_viz)
        if not with_viz:
            return state, met, None
        return state, met, (outs, images_a, images_b)

    # ------------------------------------------------------------------
    # multi-step scan variants: K update steps in ONE XLA program.
    # On the tunneled single-core platform every dispatch costs ~10 ms
    # of host + H2D overhead on top of the jitted step (docs/
    # BENCHMARKS.md round-3 wall-gap table); ``lax.scan`` over K
    # pre-staged batches amortizes that K-fold.  Numerics are identical
    # to K single-step calls: the CLI pre-folds the per-step rng chain
    # on the host (the same ``fold_in(key, it)`` chain the single-step
    # loop uses) and ships the K keys as scan inputs.  The LAST step's
    # network outputs ride the scan carry so an image cadence may land
    # exactly on a chunk boundary (reference loop being batched:
    # depth_train.py:140-166, pose_train.py:95-141).
    # ------------------------------------------------------------------
    def _scan_chunk(self, base, state, xs):
        """Run ``base`` over the leading-axis-K stacked inputs ``xs``;
        return (final state, per-step stacked metrics, last step's
        outputs).  The outputs carry is seeded with zeros via
        ``eval_shape`` (trace-only) so the compiled program contains the
        step body exactly ONCE — unrolling a first step would double
        compile time, minutes at full size on this host."""
        first = jax.tree_util.tree_map(lambda a: a[0], xs)
        outs_sd = jax.eval_shape(lambda s, x: base(s, *x)[2], state, first)
        outs0 = jax.tree_util.tree_map(
            lambda sd: jnp.zeros(sd.shape, sd.dtype), outs_sd)

        def body(carry, x):
            st, _ = carry
            st, met, outs = base(st, *x)
            return (st, outs), met

        (state, outs), mets = jax.lax.scan(body, (state, outs0), xs)
        return state, mets, outs

    def _vae_scan(self, state, labels, rngs):
        """K pose-VAE steps per dispatch: ``labels`` (K, B, D), ``rngs``
        (K, 2) uint32 pre-folded keys."""
        return self._scan_chunk(self._vae_update, state, (labels, rngs))

    def _pretrain_scan(self, state, in_a, labels_a, in_b, labels_b, rngs,
                       raw: bool = False, feat_mat: bool = True,
                       with_viz: bool = True):
        """K fused dis+gen steps per dispatch.  ``raw=True`` takes the
        fused-augment 7-tuples (each leaf stacked to leading K).
        ``with_viz=False`` drops the viz outputs (an image cadence can
        only land on a chunk's LAST step; the CLI requests viz only for
        chunks that end on one)."""
        upd = self._pretrain_update_raw if raw else self._pretrain_update

        def base(st, ia, la, ib, lb, r):
            return upd(st, ia, la, ib, lb, r, feat_mat=feat_mat,
                       with_viz=with_viz)

        return self._scan_chunk(base, state,
                                (in_a, labels_a, in_b, labels_b, rngs))

    def _post_scan(self, state, in_a, labels_a, in_b, labels_b, rngs,
                   raw: bool = False, mode: int = 3,
                   with_viz: bool = True):
        """K posterior-regression steps per dispatch."""
        upd = self._post_update_raw if raw else self._post_update

        def base(st, ia, la, ib, lb, r):
            return upd(st, ia, la, ib, lb, r, mode=mode,
                       with_viz=with_viz)

        return self._scan_chunk(base, state,
                                (in_a, labels_a, in_b, labels_b, rngs))

    # ------------------------------------------------------------------
    # posterior-regression update (lsps_trainer.py:220-262)
    # modes: 0 synth-only, 1 real-only, 3 synth+unlabeled, 4 semi-sup
    # ------------------------------------------------------------------
    def _post_update(self, state, images_a, labels_a, images_b, labels_b,
                     rng, mode: int = 3, with_viz: bool = True):
        hyp = self.hyp
        cd = self.compute_dtype
        params = state["params"]
        r_gen, r_vae_a, r_vae_b = jax.random.split(rng, 3)
        xa = images_a if cd is None else images_a.astype(cd)
        xb = images_b if cd is None else images_b.astype(cd)

        def loss_fn(dis_params):
            dis_c = cast_tree(dis_params, cd)
            reg_loss_a = reg_loss_b = 0.0
            feature_loss_a = feature_loss_b = 0.0
            images = (images_a, images_a, images_b, images_b)

            if mode == 0:
                _, pred_a, _ = self.dis.regress_a(dis_c, xa)
                enc_a, _, _ = self.vae.encode(params["vae"], labels_a,
                                              rng=r_vae_a)
                reg_loss_a = l2_loss(pred_a, enc_a)
            elif mode == 1:
                _, pred_b, _ = self.dis.regress_b(dis_c, xb)
                enc_b, _, _ = self.vae.encode(params["vae"], labels_b,
                                              rng=r_vae_b)
                reg_loss_b = l2_loss(pred_b, enc_b)
            else:
                # tiny gen slice for cross-domain feature alignment
                # (lsps_trainer.py:238-243)
                x_aa, x_ba, x_ab, x_bb, _ = self.gen(
                    cast_tree(params["gen"], cd), xa[0:4], xb[0:4],
                    rng=r_gen, train=True)
                f_aa, f_ba, f_ab, f_bb = self.dis.feats(dis_c, x_aa,
                                                        x_ba, x_ab, x_bb)
                feature_loss_a = l1_loss(f_ab - f_aa, 0.0)
                feature_loss_b = l1_loss(f_ba - f_bb, 0.0)
                images = (x_aa, x_ba, x_ab, x_bb)
                if cd is not None:  # viz/host consumers expect f32
                    images = tuple(i.astype(jnp.float32) for i in images)

                _, pred_a, _ = self.dis.regress_a(dis_c, xa)
                enc_a, _, _ = self.vae.encode(params["vae"], labels_a,
                                              rng=r_vae_a)
                reg_loss_a = l2_loss(pred_a, enc_a)

                if mode == 4:
                    _, pred_b, _ = self.dis.regress_b(dis_c, xb)
                    enc_b, _, _ = self.vae.encode(params["vae"], labels_b,
                                                  rng=r_vae_b)
                    reg_loss_b = l2_loss(pred_b, enc_b)

            total = (hyp["reg_w"] * (reg_loss_a + reg_loss_b)
                     + hyp["feature_w_reg"] * (feature_loss_a
                                               + feature_loss_b))
            aux = {
                "dis_reg_loss": reg_loss_a + reg_loss_b,
                "dis_total_loss": total,
                "dis_lr": self._dis_lr(state["opt"]["dis"][2].count),
                "images": images,
            }
            return total, aux

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params["dis"])
        grads = self._maybe_pmean(grads)
        # heads unreachable from this mode's loss graph get neither
        # grads nor decay in torch (see zeroed_subtrees): D never
        # (post_update uses regress/feats only, lsps_trainer.py:220-258),
        # plus the other domain's front in the single-domain modes
        dead = ("D", "model_B") if mode == 0 else (
            ("D", "model_A") if mode == 1 else ("D",))
        decay_ref = zeroed_subtrees(params["dis"], dead)
        updates, new_opt = self.dis_opt.update(grads, state["opt"]["dis"],
                                               decay_ref)
        new_dis = optax.apply_updates(params["dis"], updates)
        new_state = {
            "params": {**params, "dis": new_dis},
            "opt": {**state["opt"], "dis": new_opt},
            "step": state["step"],
        }
        images = aux.pop("images")
        if not with_viz:  # see _pretrain_update: XLA DCEs the panels
            return new_state, aux, None
        x_aa, x_ba, x_ab, x_bb = images
        return new_state, aux, (x_aa, x_ba, x_ab, x_bb, x_aa, x_bb, x_aa,
                                x_bb)

    # ------------------------------------------------------------------
    # visualization strip (lsps_trainer.py:264-276)
    # ------------------------------------------------------------------
    @staticmethod
    def assemble_outputs(images_a, images_b, network_outputs):
        """10-panel strip of first-sample images concatenated along width
        (NHWC axis 2)."""
        x_aa, x_ba, x_ab, x_bb, x_aba, x_bab, dec_a, dec_b = network_outputs
        panels = [images_a, x_aa, x_ab, x_aba, dec_a, dec_b,
                  images_b, x_bb, x_ba, x_bab]
        return jnp.concatenate([p[0:1, :, :, 0:3] for p in panels], axis=2)

    # ------------------------------------------------------------------
    # checkpoint API (lsps_trainer.py:278-332)
    # ------------------------------------------------------------------
    def save(self, state, snapshot_prefix, iterations):
        self.ckpt.save(state, snapshot_prefix, iterations)

    def save_vae(self, state, snapshot_prefix, iterations, frac):
        self.ckpt.save_vae(state["params"]["vae"], snapshot_prefix,
                           iterations, frac)

    def resume(self, state, snapshot_prefix, idx=-1, load_opt=False,
               est=False):
        state, iterations = self.ckpt.resume(state, snapshot_prefix,
                                             idx=idx, load_opt=load_opt,
                                             est=est)
        # a same-run resume (load_opt=True) without optimizer files must
        # still continue the LR schedule from the parsed iteration — the
        # reference replays its schedulers unconditionally
        # (depth_train.py:111-113); Adam moments restart fresh, matching
        # the reference's new Adam instances
        if load_opt and iterations > 0 and not getattr(
                self.ckpt, "last_opt_loaded", False):
            opt = dict(state["opt"])
            for k in ("gen", "dis"):
                opt[k] = self._seed_schedule_count(opt[k], iterations)
            state = {**state, "opt": opt}
        return state, iterations

    @staticmethod
    def _seed_schedule_count(opt_state, count):
        """Set the scale_by_schedule count (chain slot 2: decayed-weights,
        adam, schedule — see train/optim.py) to ``count``."""
        sched = opt_state[2]
        sched = sched._replace(count=jnp.asarray(count, jnp.int32))
        return tuple(opt_state[:2]) + (sched,)

    def load_vae(self, state, snapshot_prefix, frac):
        return self.ckpt.load_vae(state, snapshot_prefix, frac)
