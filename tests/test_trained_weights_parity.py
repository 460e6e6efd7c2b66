"""Trained-weights end-to-end parity proxy (round-2 verdict next #4).

The real ±0.5 mm gate needs the released checkpoints + NYU/ICVL data
(absent here; scripts/parity_gate.py runs it the day they appear).  The
strongest proxy buildable in this environment: TRAIN the torch doubles
with a reference-faithful torch loop (optimizers/losses of
src/trainers/lsps_trainer.py:26-29,62-74,245-252), convert the trained
checkpoint through the same converter a released .pkl would use, and
assert our eval pipeline reproduces torch's mean-mm-error to float
tolerance.  Unlike the random-weights forward-parity suite this
exercises converter + model + eval protocol on weights with real
structure (trained filters, non-init statistics).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lsps_tpu.config import default_hyperparameters  # noqa: E402
from lsps_tpu.eval.handpose_evaluation import (  # noqa: E402
    HandposeEvaluation)
from lsps_tpu.models import build_model  # noqa: E402
from lsps_tpu.train.torch_convert import convert_state_dict  # noqa: E402

from test_full_model_torch_parity import (  # noqa: E402
    TorchPoseVAE, TorchSharedDis)

CH = 4
REG = 12
HYP = default_hyperparameters(reg_dim=REG, small=True)
HYP["vae"]["input_dim"] = REG
HYP["dis"]["reg_dim"] = REG
HYP["dis"]["ch"] = CH
HYP["gen"]["ch"] = CH


def _synth_data(n, seed):
    """Fixed synthetic crops + poses: smooth blobby depth patterns in
    [-1, 1] and normalized pose vectors correlated with them (so the
    regression has signal to learn)."""
    rs = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float32) / 128.0
    imgs, poses = [], []
    for _ in range(n):
        c = rs.rand(2) * 0.6 + 0.2
        r = rs.rand() * 0.2 + 0.1
        blob = np.exp(-(((xx - c[0]) ** 2 + (yy - c[1]) ** 2) / r ** 2))
        imgs.append((blob * 2.0 - 1.0).astype(np.float32))
        pose = np.concatenate([c, [r]])
        pose = np.tile(pose, REG // 3 + 1)[:REG]
        poses.append((pose + rs.randn(REG) * 0.02).astype(np.float32))
    return (np.stack(imgs)[:, None], np.stack(poses))  # NCHW, (N, REG)


def _train_torch(imgs, poses, steps_vae=120, steps_dis=120):
    """Reference-faithful torch training: vae_update then post_update
    mode 1 (lsps_trainer.py:62-74, :245-252 with the deterministic mu
    code as the target)."""
    torch.manual_seed(0)
    lr = HYP["lr"]
    vae = TorchPoseVAE(REG, HYP["vae"]["z_dim"], HYP["vae"]["h_dim"])
    dis = TorchSharedDis(CH, HYP["dis"]["n_front_layer"],
                         HYP["dis"]["n_shared_layer"],
                         HYP["dis"]["post_dim"])
    y = torch.from_numpy(poses)
    x = torch.from_numpy(imgs)

    # vae optimizer: lr*10, betas (0.5, 0.999), wd 1e-3
    # (lsps_trainer.py:29)
    opt_v = torch.optim.Adam(vae.parameters(), lr=lr * 10,
                             betas=(0.5, 0.999), weight_decay=1e-3)
    for _ in range(steps_vae):
        mu, sd = vae.encode(y)
        dec = vae.decode(mu)  # deterministic code (eval-mode semantics)
        kl = torch.sum(mu ** 2 + sd ** 2 - torch.log(sd ** 2)) / y.shape[0]
        ll = torch.mean(torch.abs(dec - y))
        loss = HYP["kl_loss_vae"] * kl + HYP["ll_loss_vae"] * ll
        opt_v.zero_grad()
        loss.backward()
        opt_v.step()
    vae.eval()

    # dis optimizer: lr, betas (0.5, 0.999), wd 1e-4
    # (lsps_trainer.py:26-27)
    opt_d = torch.optim.Adam(dis.parameters(), lr=lr, betas=(0.5, 0.999),
                             weight_decay=1e-4)
    with torch.no_grad():
        target, _ = vae.encode(y)
    for _ in range(steps_dis):
        pred = dis.regress_b(x)
        loss = HYP["reg_w"] * torch.mean((pred - target) ** 2)
        opt_d.zero_grad()
        loss.backward()
        opt_d.step()
    dis.eval()
    return vae, dis


def test_trained_weights_eval_parity():
    imgs, poses = _synth_data(16, seed=11)
    test_imgs, test_poses = _synth_data(8, seed=22)
    vae_t, dis_t = _train_torch(imgs, poses)

    coms = np.tile(np.array([[10.0, -5.0, 780.0]], np.float32), (8, 1))
    cubes = np.full((8, 3), 300.0, np.float32)

    # --- torch eval (depth_train.py:197-239 protocol) ------------------
    with torch.no_grad():
        post = dis_t.regress_b(torch.from_numpy(test_imgs))
        pred_t = vae_t.decode(post).numpy()
    gt3d = (test_poses.reshape(8, -1, 3) * (cubes[:, :1, None] / 2.0)
            + coms[:, None, :])
    jt_t = (pred_t.reshape(8, -1, 3) * (cubes[:, :1, None] / 2.0)
            + coms[:, None, :])
    err_t = float(np.mean(np.mean(np.sqrt(
        ((gt3d - jt_t) ** 2).sum(-1)), axis=1)))

    # --- converted weights through OUR eval pipeline -------------------
    jvae = build_model(HYP["vae"])
    jdis = build_model(HYP["dis"])
    pv = convert_state_dict(vae_t.state_dict(),
                            jvae.init(jax.random.PRNGKey(0)))
    pd = convert_state_dict(dis_t.state_dict(),
                            jdis.init(jax.random.PRNGKey(1)))

    @jax.jit
    def predict(pd, pv, x):
        _, post, _ = jdis.regress_b(pd, x)
        return jvae.decode(pv, post)

    x = jnp.asarray(test_imgs.transpose(0, 2, 3, 1))
    pred_j = np.asarray(predict(pd, pv, x))
    np.testing.assert_allclose(pred_j, pred_t, rtol=1e-3, atol=2e-4)

    jt_j = (pred_j.reshape(8, -1, 3) * (cubes[:, :1, None] / 2.0)
            + coms[:, None, :])
    hpe = HandposeEvaluation(gt3d, jt_j)
    err_j = hpe.getMeanError()

    # trained-weights end-to-end: same mm number both frameworks
    assert abs(err_j - err_t) < 5e-3, (err_j, err_t)
    # and the training learned something (converter fed non-trivial
    # weights, not inits): error well below the untrained ~decode(0)
    # scale of this manifold
    jvae0 = jvae.init(jax.random.PRNGKey(3))
    jdis0 = jdis.init(jax.random.PRNGKey(4))
    pred0 = np.asarray(predict(jdis0, jvae0, x))
    jt_0 = (pred0.reshape(8, -1, 3) * (cubes[:, :1, None] / 2.0)
            + coms[:, None, :])
    err_0 = HandposeEvaluation(gt3d, jt_0).getMeanError()
    assert err_j < err_0 * 0.8, (err_j, err_0)
