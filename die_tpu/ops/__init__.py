from die_tpu.ops.gaussian import central_gradient, separable_gaussian
from die_tpu.ops.convops import circular_conv
from die_tpu.ops.mxu_gather import onehot_gather_flat, use_mxu_gather
from die_tpu.ops.perlin import perlin_field
from die_tpu.ops.waves import flow_time, perlin_flow_field, wave_field

__all__ = ["central_gradient", "separable_gaussian", "circular_conv",
           "onehot_gather_flat", "use_mxu_gather", "perlin_field",
           "flow_time", "perlin_flow_field", "wave_field"]
