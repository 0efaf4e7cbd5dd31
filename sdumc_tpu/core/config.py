"""Single-source configuration for the whole framework.

The reference scatters configuration across three tiers (argparse per entry
point, absolute-path dicts in ``config.py:8-65``, and a pretrained-model name
registry in ``toolkit/globals.py``) and mutates args in flight
(``main_frame_val_text_missing.py:287``, ``toolkit/models/__init__.py:34``).
Here everything is an immutable dataclass; CLI entry points parse flags into
these and never mutate them afterwards.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class PathsConfig:
    """Filesystem layout of a dataset (reference: config.py:8-65).

    The on-disk contract matches the reference L1->L3 interface: a directory
    per feature type containing ``{clip}.npy`` of shape ``[T, D]``, and a
    label ``.npz`` with ``train_corpus/val_corpus/test_corpus`` dicts of
    ``name -> {'emo', 'val'}``.
    """

    data_dir: str = ""
    features_dir: str = ""       # PATH_TO_FEATURES[dataset]
    label_path: str = ""         # PATH_TO_LABEL[dataset]
    transcriptions_path: str = ""
    raw_audio_dir: str = ""
    raw_face_dir: str = ""
    pretrained_models_dir: str = ""
    save_root: str = "./saved"

    @staticmethod
    def from_env(dataset: str = "CMU-MOSEI") -> "PathsConfig":
        root = os.environ.get("SDUMC_DATA_DIR", os.path.join(os.getcwd(), "dataset"))
        return PathsConfig(
            data_dir=root,
            features_dir=os.path.join(root, "features", dataset),
            label_path=os.path.join(root, "labels", f"{dataset}.npz"),
            transcriptions_path=os.path.join(root, f"{dataset}_text.csv"),
            raw_audio_dir=os.path.join(root, "audio", dataset),
            raw_face_dir=os.path.join(root, "faces", dataset),
            pretrained_models_dir=os.path.join(root, "tools"),
        )


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input-pipeline configuration (reference L3).

    ``feat_type``/``feat_scale`` mirror the reference's length-remap options
    (``toolkit/utils/read_data.py:120-191``); bucketing is new (the reference
    instead pads to per-batch max with dynamic shapes and *deletes* the 51
    longest train clips, ``toolkit/dataloader/cmumosei.py:10-62,90-94``).
    """

    dataset: str = "CMU-MOSEI"
    # Cross-corpus transfer (reference --train_dataset/--test_dataset,
    # main_frame_val_text_missing.py:214-216,261-262): when train_dataset
    # is set, get_loaders routes to the CROSSDIM/CROSSDIS builders —
    # train/val from train_dataset, test from test_dataset.
    train_dataset: str = ""
    test_dataset: str = ""
    audio_feature: str = "wavlm-large-FRA_-5"
    text_feature: str = "vicuna-7b-v1.5-FRA-wavlm2vicuna-half-gt"
    video_feature: str = "manet_FRA"
    feat4_feature: str = (
        "vicuna-7b-v1.5-FRA-wavlm2vicuna-half-wav+prompt[take_generate_wordembed_-4]"
    )
    feat_type: str = "frm_unalign"   # [utt, frm_align, frm_unalign]
    feat_scale: int = 1              # pre-compress [T, D] -> [T/scale, D]
    batch_size: int = 96
    num_workers: int = 4
    drop_too_long_train_clips: bool = True
    debug: bool = False              # truncate every split to 100 samples
    # Static-shape bucketing: sequences are zero-padded up to the smallest
    # bucket boundary >= the batch max; reference batch-max semantics are
    # recovered exactly via a traced `t_max` softmax mask (see ops/masking.py).
    length_buckets: Tuple[int, ...] = (64, 128, 256, 512, 1024, 2048, 4096)
    # Frame-feature dtype on device. The fusion model is HBM-bound on the
    # [B, T, 1024/4096] feature reads; "bfloat16" halves that traffic
    # (+46% inference throughput on v5e, max pred deviation ~4e-8 — the
    # first projection accumulates in f32). "float32" keeps the
    # checkpoint-exact parity path bit-identical.
    feature_dtype: str = "float32"
    shuffle_seed: int = 100


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Fusion-model hyperparameters (reference model defaults:
    toolkit/models/wengnet_mosei_mult_views_text_missing.py:186-273)."""

    name: str = "wengnet_mosei_mult_views_text_missing"
    input_dims: Tuple[int, int, int] = (1024, 4096, 1024)  # audio, text, video
    general_dim: int = 256
    layers: Tuple[int, ...] = (256, 128)
    fused_layers: Tuple[int, ...] = (256, 256)
    output_dim: int = 1
    # baseline families (tfn/lmf/attention/misa/mmim, models/baselines.py;
    # mfn/graph_mfn/mfm/mctn/mult, models/baselines_seq.py): reference tuner
    # grid ranges hidden [32..256] / rank [3..6] / mem 128 / window 2
    # (model-tune.yaml:1-80)
    baseline_hidden_dim: int = 32
    baseline_rank: int = 4
    baseline_mem_dim: int = 32       # MFN/Graph-MFN gated memory, MFM factors
    baseline_align_t: int = 32       # in-model temporal alignment length for
                                     # the align-only families (the reference
                                     # requires pre-aligned features instead)
    baseline_layers: int = 2         # MulT transformer depth / MMIM cpc_layers
    baseline_heads: int = 4          # MulT attention heads
    baseline_kernel_size: int = 3    # MulT conv1d temporal kernel
    # per-family auxiliary-loss weights (reference grids model-tune.yaml)
    misa_sim_w: float = 0.1
    misa_diff_w: float = 0.1
    misa_recon_w: float = 0.1
    mmim_alpha: float = 0.1
    mmim_beta: float = 0.1
    mfm_recon_w: float = 0.1
    mfm_mmd_w: float = 1.0
    mctn_cycle_w: float = 0.3
    mctn_teacher_forcing: float = 0.5
    # NOTE: the reference CLI parses --dropout=0.5 but never forwards it into
    # the model (toolkit/models/__init__.py:67); the model's own default 0.3
    # is what actually trains. We default to the live value.
    dropout: float = 0.3
    attn_dropout: float = 0.5        # FRA2UTT_new / Cross_Attention hardcode 0.5
    softmax_scale: float = 0.3
    rnc_proj_dim: int = 64
    # The imagination ResidualAE modules are constructed in the reference (so
    # their params exist in the released checkpoint) but their substitution is
    # commented out on the live path (:297-299,342-344). We build them too and
    # gate the substitution behind this flag.
    use_imagination: bool = False
    dtype: str = "float32"           # fusion net is small; f32 for parity
    # Frame-stream activation dtype for the fusion net. "auto" follows the
    # features' dtype: f32 inputs (checkpoint-parity flows) compute exactly
    # as before; bf16 features — the production store — get bf16
    # activations through every [B, T, d] stream, which is 76% of the
    # train step's device time (profiles/step_ops.md). Params, softmaxes,
    # pooled tensors, heads, and losses stay f32 either way.
    compute_dtype: str = "auto"
    # Matmul precision: "highest" = true f32 (required for checkpoint-exact
    # parity; the 12.8M-param fusion net is bandwidth-bound so this is ~free),
    # "default" = backend fast path (bf16 MXU passes on TPU) for bulk
    # throughput when parity is not required.
    matmul_precision: str = "highest"
    # Fused Pallas kernels for the frame attention ops (ops/pallas/): "on",
    # "off", or "auto". Round-1: at the live dims (D=256, T<=512, bs=128)
    # XLA's fusion of the einsum formulation wins (5.2k vs 4.6k clips/s
    # dual-view). Round-2 settled the promised long-sequence regime with a
    # (T, D) sweep on v5e (B=32, fetch-barrier timings): at D=256 the
    # kernels sit within tunnel-timing noise of XLA across T=512..4096
    # (pool 0.8-1.2x, one outlier 4.3x at T=2048; cross 0.7-2.0x) — no
    # regime with a consistent, reproducible win. D>=512 with a >=4x4 grid
    # additionally crashes this environment's chipless AOT compile helper
    # (each dimension compiles alone; the combination dies server-side —
    # toolchain quirk, tiles are VMEM-bounded in fused_cross.py). Verdict:
    # "auto" resolves to OFF everywhere; the kernels stay as the tested
    # substrate the flash_wavlm encoder kernel (the Pallas path that DOES
    # pay, see scripts/bench_extractors.py long_flash vs long_einsum) was
    # built from.
    use_pallas: str = "auto"


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Loss mixing weights (canonical recipe:
    shell/main_text_missing_icassp.sh:6)."""

    full_mse_w: float = 0.5
    missing_mse_w: float = 0.5
    text_feat_w: float = 0.0
    text_query_feat_w: float = 0.0
    features_w: float = 0.13
    rnc_w: float = 0.5
    rnc_temperature: float = 2.0
    # On-device frame-dropout augmentation for audio/video streams. The
    # reference computes 20% dropout masks but never uses them (dead code,
    # main_frame_val_text_missing.py:123-129); 0.0 reproduces the live
    # behavior, >0 enables the augmentation on-device (SURVEY north star).
    frame_dropout_p: float = 0.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer/schedule (reference: main_frame_val_text_missing.py:317-321)."""

    lr: float = 1e-4
    l2: float = 1e-5                 # torch-Adam style L2 (decay added to grad)
    epochs: int = 25
    warmup_epochs: int = 5
    decay_gamma: float = 0.9
    decay_stepsize: int = 10
    seed: int = 100
    checkpoint_dir: str = "./saved/ckpt"
    keep_checkpoints: int = 2
    log_every_steps: int = 50
    # PRNG implementation for the training rng (dropout masks). "rbg" uses
    # the TPU's hardware bit generator — threefry mask generation over the
    # [2B, T, d] frame streams is real VPU time in the step profile, and
    # dropout needs no counter-based reproducibility-across-shardings
    # guarantees. "threefry2x32" restores JAX's default stream.
    rng_impl: str = "rbg"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. The fusion net (12.8M params) trains pure-DP with
    replicated params; the big extractor graphs (7B Vicuna) add a model axis."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1          # -1: all devices
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    paths: PathsConfig = dataclasses.field(default_factory=PathsConfig.from_env)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, default=str)
