from lsps_tpu.serve.inference import PoseEstimator, latent_walk  # noqa: F401
from lsps_tpu.serve.export import (  # noqa: F401
    export_pose_program, load_pose_program, save_pose_program)
