"""Optimizers and LR schedules (optax).

Reproduces the reference's training-dynamics-critical choices
(reference: src/trainers/lsps_trainer.py:26-34):

* Adam(betas=(0.5, 0.999)) with *non-decoupled* weight decay (torch adds
  ``wd * p`` to the gradient before the Adam moments) — hence
  ``add_decayed_weights`` placed *before* ``scale_by_adam``.
* MultiStepLR stepped externally every ``sch_interval`` iterations by the
  loop (src/depth_train.py:154-156 uses 1000 in pretrain, :163-164 uses
  100 in estimate mode; src/pose_train.py:132-133 uses 1000) — here the
  LR is a pure function of the step count, which makes resume trivially
  correct (the reference replays scheduler steps, depth_train.py:111-113).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax

DIS_GEN_MILESTONES = (200, 300, 400, 450)  # lsps_trainer.py:32-33
DIS_GEN_GAMMA = 0.5
VAE_MILESTONES = (125, 175)                # lsps_trainer.py:34
VAE_GAMMA = 0.1


def multistep_lr(base_lr: float, milestones: Sequence[int], gamma: float,
                 sch_interval: int):
    """LR as a function of the update count.

    The reference's scheduler "epoch" after iteration ``it`` is
    ``(it + 1) // sch_interval`` (stepped before the update at iterations
    where ``(it+1) % interval == 0``); the LR is
    ``base * gamma ** #{m : epoch >= m}``.
    """
    ms = jnp.asarray(milestones)

    def schedule(count):
        epochs = (count + 1) // sch_interval
        n = jnp.sum(epochs >= ms)
        return base_lr * (gamma ** n)

    return schedule


def adam_multistep(base_lr: float, weight_decay: float,
                   milestones: Sequence[int], gamma: float,
                   sch_interval: int, b1: float = 0.5, b2: float = 0.999,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    """torch-parity Adam + weight decay + MultiStepLR chain."""
    sched = multistep_lr(base_lr, milestones, gamma, sch_interval)
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_schedule(lambda count: -sched(count)),
    )


def dis_optimizer(lr: float, sch_interval: int = 1000):
    """Discriminator: lr, wd 1e-4 (lsps_trainer.py:26)."""
    return adam_multistep(lr, 1e-4, DIS_GEN_MILESTONES, DIS_GEN_GAMMA,
                          sch_interval)


def gen_optimizer(lr: float, sch_interval: int = 1000):
    """Generator + mapping: lr, wd 1e-4 (lsps_trainer.py:27-28)."""
    return adam_multistep(lr, 1e-4, DIS_GEN_MILESTONES, DIS_GEN_GAMMA,
                          sch_interval)


def vae_optimizer(lr: float, sch_interval: int = 1000):
    """Pose VAE: lr x10, wd 1e-3 (lsps_trainer.py:29)."""
    return adam_multistep(lr * 10.0, 1e-3, VAE_MILESTONES, VAE_GAMMA,
                          sch_interval)
