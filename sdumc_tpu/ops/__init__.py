from sdumc_tpu.ops import masking  # noqa: F401
from sdumc_tpu.ops.attention_pool import attention_pool  # noqa: F401
from sdumc_tpu.ops.cross_attention import multi_query_cross_attention  # noqa: F401
