from lsps_tpu.ops.layers import (  # noqa: F401
    Layer, sequential, conv2d, conv2d_transpose, linear, instance_norm,
    leaky_relu_layer, relu_layer, tanh_layer, gaussian_noise_layer,
    leaky_relu_conv2d, leaky_relu_conv_transpose2d, leaky_relu_linear,
    leaky_ins_res_block, ins_res_block, leaky_ins_resnext_block,
    instance_norm_layer, dropout_layer,
)
