from lsps_tpu.ops.pallas.norm_act import (  # noqa: F401
    fused_instance_norm_leaky_relu, set_pallas_enabled, pallas_enabled,
    set_pallas_interpret,
)
