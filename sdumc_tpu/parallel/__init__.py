from sdumc_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_hierarchical_mesh,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from sdumc_tpu.parallel.combined import make_tp_dp_dual_step  # noqa: F401
from sdumc_tpu.parallel.pipeline import (  # noqa: F401
    llama_pp_forward,
    pipeline_apply,
    stage_sharding,
)
from sdumc_tpu.parallel.sharding import (  # noqa: F401
    llama_specs,
    partition_specs,
    shard_model_params,
    shard_params,
    tp_sharding_summary,
    wavlm_specs,
)
