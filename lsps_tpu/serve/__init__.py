from lsps_tpu.serve.inference import PoseEstimator, latent_walk  # noqa: F401
