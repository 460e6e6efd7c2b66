from lsps_tpu.models.pose_vae import PoseVAE  # noqa: F401
from lsps_tpu.models.shared_gen import SharedResGen, SharedResXGen  # noqa: F401
from lsps_tpu.models.shared_dis import SharedDis  # noqa: F401
from lsps_tpu.models.mapping import Mapping  # noqa: F401

from lsps_tpu.registry import lookup as _lookup


def build_model(cfg: dict):
    """Instantiate a model from a config dict with a ``name`` key
    (replaces the reference's exec dispatch, lsps_trainer.py:21-24)."""
    return _lookup("model", cfg["name"])(cfg)
