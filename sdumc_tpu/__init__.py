"""sdumc_tpu — a TPU-native multimodal sentiment framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the SDUMC
reference pipeline ("Enhancing Multimodal Sentiment Analysis for Missing
Modality through Self-Distillation and Unified Modality Cross-Attention"):

* offline feature-extraction graphs (audio SSL encoders, LLM text
  embeddings, visual face encoders, audio->LLM pseudo-text bridge),
* a unified-modality cross-attention fusion network,
* a dual-view self-distillation training loop (full-modality teacher,
  text-missing student) with an RnC regression-contrastive loss,
* CMU-MOSEI valence evaluation (MSE / MAE / corr / Acc-2 / F1 / Acc-7).

Everything device-side is jit-compiled JAX with Pallas kernels for the hot
attention ops; parallelism is expressed over a `jax.sharding.Mesh`
(data/model axes) rather than per-process collectives.
"""

__version__ = "0.1.0"

from sdumc_tpu.core import config  # noqa: F401
