"""Pose-latent -> depth-latent feature-map mapping network.

Reference: src/trainers/lsps_nets.py:8-31 (``Mapping``): a 20-d pose code
is reshaped to a 1x1 feature map and upsampled by 4 ConvTranspose layers
to (output_dim, output_dim, output_ch) — the generator's shared-latent
spatial shape.  Used when ``train_map: True``.
"""

from __future__ import annotations

import jax

from lsps_tpu.ops import layers as L
from lsps_tpu.registry import register


@register("model", "Mapping")
class Mapping:
    def __init__(self, cfg: dict):
        self.cfg = dict(cfg)
        self.input_dim = cfg["input_dim"]
        dim = cfg["output_dim"]
        ch = cfg["output_ch"]
        self.output_shape = (dim, dim, ch)
        self._model = L.sequential(
            L.leaky_relu_conv_transpose2d(self.input_dim, 4 * ch, 4, 1, 0),
            L.leaky_relu_conv_transpose2d(4 * ch, 4 * ch, 4, 2, 1),
            L.leaky_relu_conv_transpose2d(4 * ch, 2 * ch, 4, 2, 1),
            L.conv2d_transpose(2 * ch, ch, 4, 2, 1),
        )

    def init(self, key):
        return self._model.init(key)

    def __call__(self, params, z):
        """z: (B, input_dim) -> (B, dim, dim, ch) NHWC
        (lsps_nets.py:30-31 unsqueezes to a 1x1 map)."""
        x = z[:, None, None, :]
        return self._model.apply(params, x)
