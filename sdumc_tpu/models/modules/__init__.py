from sdumc_tpu.models.modules.transformer_encoder import (  # noqa: F401
    CrossModalTransformerEncoder,
    LSTMEncoder,
    MLPEncoder,
    sinusoidal_positions,
)
