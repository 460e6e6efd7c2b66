"""Remaining coverage: latent-walk CLI, depth->point-cloud
back-projection, HTML gallery, image-strip saving."""

import os

import numpy as np
import pytest

from lsps_tpu.data.camera import Camera


def test_depth_to_pcl_roundtrip():
    """Back-projected crop points must land at the original metric
    depths (importers.py:160-177 semantics)."""
    cam = Camera.nyu()
    from lsps_tpu.data.detector import HandDetector
    from lsps_tpu.data.synthetic import render_hand_depth

    gen = np.random.RandomState(2)
    com3d = np.array([0.0, 0.0, 700.0], np.float32)
    dpt, _ = render_hand_depth(cam, com3d, 14, gen)
    hd = HandDetector(dpt, cam.fx, cam.fy)
    crop, M, com = hd.crop_area_3d(com=cam.to_img(com3d),
                                   size=(300, 300, 300))
    pcl = cam.depth_to_pcl(crop, M)
    assert pcl.shape[1] == 3
    assert pcl.shape[0] > 50
    # depths preserved; x/y within the metric cube around the com
    assert np.all(pcl[:, 2] > 500) and np.all(pcl[:, 2] < 900)
    assert np.abs(pcl[:, 0] - com3d[0]).max() < 250


def test_latent_walk_cli(tmp_path):
    from lsps_tpu.cli import latent_walk

    out = str(tmp_path / "walk.avi")
    latent_walk.main(["--config", "exps/synth.yaml", "--steps", "3",
                      "--out", out])
    assert os.path.isfile(out)
    assert os.path.isfile(str(tmp_path / "walk_strip.png"))


def test_write_html_gallery(tmp_path):
    from lsps_tpu.utils.logging import write_html

    path = str(tmp_path / "index.html")
    write_html(path, 50, 10, str(tmp_path / "images"))
    html = open(path).read()
    assert "gen.jpg" in html and "gen_00000050.jpg" in html


def test_save_image_strip(tmp_path):
    import jax.numpy as jnp

    from lsps_tpu.utils.viz import save_image_strip

    strip = jnp.zeros((1, 64, 640, 1))
    p = str(tmp_path / "gen.jpg")
    save_image_strip(strip, p)
    assert os.path.isfile(p)


def test_host_fold_in_matches_device_fold_in():
    """The CLI's host-side rng fold must be bit-identical to the
    on-device jax.random.fold_in chain (threefry is deterministic
    across backends) — the training RNG stream must not depend on
    where the fold runs."""
    import numpy as np
    import jax

    from lsps_tpu.cli.common import host_fold_in

    dev = jax.random.PRNGKey(23455)
    host = np.asarray(dev)
    for it in (0, 1, 2, 77, 10_000):
        dev = jax.random.fold_in(dev, it)
        host = host_fold_in(host, it)
        assert isinstance(host, np.ndarray)
        np.testing.assert_array_equal(np.asarray(dev), host)


def test_conv_transpose_1x1_output_padding_shape():
    """The 1x1 fast path must not swallow output_padding (torch formula:
    out = (in-1)*s - 2p + k + output_padding)."""
    import jax
    import jax.numpy as jnp

    from lsps_tpu.ops import layers as L

    layer = L.conv2d_transpose(4, 2, 1, stride=1, padding=0,
                               output_padding=1)
    p = layer.init(jax.random.PRNGKey(0))
    y = layer.apply(p, jnp.zeros((2, 8, 8, 4)))
    assert y.shape == (2, 9, 9, 2)
    # and the fast-path case keeps the same-size output
    layer0 = L.conv2d_transpose(4, 2, 1, stride=1, padding=0)
    p0 = layer0.init(jax.random.PRNGKey(0))
    assert layer0.apply(p0, jnp.zeros((2, 8, 8, 4))).shape == (2, 8, 8, 2)
