from sdumc_tpu.ops.pallas.fused_pool import fused_attention_pool  # noqa: F401
from sdumc_tpu.ops.pallas.fused_cross import fused_cross_attention  # noqa: F401
