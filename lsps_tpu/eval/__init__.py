from lsps_tpu.eval.handpose_evaluation import (  # noqa: F401
    HandposeEvaluation, NYUHandposeEvaluation, ICVLHandposeEvaluation,
    MSRAHandposeEvaluation,
)
