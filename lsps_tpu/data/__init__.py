from lsps_tpu.data.camera import Camera  # noqa: F401
from lsps_tpu.data.basetypes import DepthFrame, NamedImgSequence  # noqa: F401
