from sdumc_tpu.convert.torch_to_jax import (  # noqa: F401
    load_torch_checkpoint,
    torch_state_dict_to_params,
)
