from lsps_tpu.train.trainer import LSPSTrainer, TrainState  # noqa: F401
