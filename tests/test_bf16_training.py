"""Mixed-precision (bf16 compute / f32 params+reductions) training mode.

`compute_dtype: bfloat16` runs the conv-heavy gen/dis forwards in bf16 —
MXU-native on TPU — while parameters, optimizer state, losses and norm
statistics stay f32.  These tests pin that the mode (a) keeps the state
f32, (b) tracks the f32 loss trajectory closely over several steps, and
(c) covers all three image update rules.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lsps_tpu.config import default_hyperparameters
from lsps_tpu.train import LSPSTrainer


def _hyp(**over):
    hyp = default_hyperparameters(reg_dim=12, small=True)
    hyp["vae"]["input_dim"] = 12
    hyp["dis"]["reg_dim"] = 12
    hyp["dis"]["ch"] = 4
    hyp["gen"]["ch"] = 4
    hyp["map"]["output_ch"] = 16
    hyp.update(over)
    return hyp


B = 2


@pytest.fixture(scope="module")
def batches():
    rs = np.random.RandomState(0)
    return [(jnp.asarray(rs.randn(B, 128, 128, 1).astype(np.float32) * .2),
             jnp.asarray(rs.randn(B, 12).astype(np.float32) * .3),
             jnp.asarray(rs.randn(B, 128, 128, 1).astype(np.float32) * .2),
             jnp.asarray(rs.randn(B, 12).astype(np.float32) * .3))
            for _ in range(4)]


def _run(trainer, batches):
    state = trainer.init_state(jax.random.PRNGKey(0))
    hist = []
    for i, (ia, la, ib, lb) in enumerate(batches):
        state, m, outs = trainer.pretrain_update(state, ia, la, ib, lb,
                                                 jax.random.PRNGKey(i))
        hist.append({k: float(v) for k, v in m.items()})
    return state, hist, outs


def test_bf16_tracks_f32_loss_trajectory(batches):
    t32 = LSPSTrainer(_hyp())
    t16 = LSPSTrainer(_hyp(compute_dtype="bfloat16"))
    s32, h32, outs32 = _run(t32, batches)
    s16, h16, outs16 = _run(t16, batches)

    for m32, m16 in zip(h32, h16):
        for k in ("dis_loss", "gen_total_loss", "gen_ll_loss"):
            assert np.isfinite(m16[k]), k
            # bf16 has ~3 significant digits; trajectories must agree to
            # a few percent, not bitwise
            assert m16[k] == pytest.approx(m32[k], rel=0.08, abs=0.05), \
                f"{k}: f32 {m32[k]} vs bf16 {m16[k]}"

    # params and optimizer state remain f32 at rest
    for leaf in jax.tree_util.tree_leaves(s16):
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            assert jnp.asarray(leaf).dtype == jnp.float32

    # network outputs handed to viz are f32
    for o in outs16:
        assert o.dtype == jnp.float32


def test_bf16_post_update_modes(batches):
    t16 = LSPSTrainer(_hyp(compute_dtype="bfloat16"))
    state = t16.init_state(jax.random.PRNGKey(1))
    ia, la, ib, lb = batches[0]
    for mode in (0, 1, 3, 4):
        s, m, outs = t16.post_update(state, ia, la, ib, lb,
                                     jax.random.PRNGKey(mode), mode=mode)
        assert np.isfinite(m["dis_total_loss"]), mode
        for o in outs:
            assert o.dtype == jnp.float32


def test_bf16_train_map_path(batches):
    t16 = LSPSTrainer(_hyp(compute_dtype="bfloat16", train_map=True))
    state = t16.init_state(jax.random.PRNGKey(2))
    ia, la, ib, lb = batches[0]
    state, m, outs = t16.pretrain_update(state, ia, la, ib, lb,
                                         jax.random.PRNGKey(9))
    for k in ("dis_loss", "gen_total_loss", "gen_map_loss",
              "gen_map_loss2"):
        assert np.isfinite(m[k]), k


def test_bad_compute_dtype_rejected():
    with pytest.raises(ValueError):
        LSPSTrainer(_hyp(compute_dtype="float16"))
