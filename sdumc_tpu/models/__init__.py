from sdumc_tpu.core.registry import MODELS
from sdumc_tpu.models.baselines import (  # noqa: F401  (self-register)
    LMF, MISA, MMIM, TFN, AttentionFusion)
from sdumc_tpu.models.baselines_seq import (  # noqa: F401  (self-register)
    MCTN, MFM, MFN, MULT, GraphMFN)
from sdumc_tpu.models.fusion import SDUMCFusion  # noqa: F401  (self-registers)


def get_model(cfg):
    """Factory mirroring the reference's `get_models` dispatch
    (toolkit/models/__init__.py:29-67) over our registry."""
    return MODELS.get(cfg.name)(cfg)
