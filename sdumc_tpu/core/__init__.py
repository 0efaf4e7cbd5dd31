from sdumc_tpu.core import config, metrics, registry  # noqa: F401
