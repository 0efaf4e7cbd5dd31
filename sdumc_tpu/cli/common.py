"""Shared CLI argument plumbing.

Flag names mirror the reference's argparse surface
(main_frame_val_text_missing.py:210-253) so existing shell recipes
(shell/main_text_missing_icassp.sh) port by changing only the script name;
TPU-specific additions are grouped separately.
"""

from __future__ import annotations

import argparse

from sdumc_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    PathsConfig,
    TrainConfig,
)


def add_reference_args(p: argparse.ArgumentParser) -> None:
    # input (reference :213-226)
    p.add_argument("--dataset", type=str, default="CMU-MOSEI")
    p.add_argument("--train_dataset", type=str, default=None)
    p.add_argument("--valid_dataset", type=str, default=None)
    p.add_argument("--test_dataset", type=str, default=None)
    p.add_argument("--audio_feature", type=str, default=DataConfig.audio_feature)
    p.add_argument("--text_feature", type=str, default=DataConfig.text_feature)
    p.add_argument("--video_feature", type=str, default=DataConfig.video_feature)
    p.add_argument("--feat4_feature", type=str, default=DataConfig.feat4_feature)
    p.add_argument("--debug", action="store_true", default=False)
    p.add_argument("--test_sets", type=str, default="test1,test2")
    p.add_argument("--save_root", type=str, default="./saved")
    p.add_argument("--savewhole", action="store_true", default=False)
    p.add_argument("--feat_type", type=str, default="frm_unalign",
                   choices=["utt", "frm_align", "frm_unalign"])
    p.add_argument("--feat_scale", type=int, default=1)
    p.add_argument("--feature_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="bfloat16 halves feature HBM/h2d traffic (+46%% "
                        "inference throughput, pred deviation ~4e-8); "
                        "float32 keeps checkpoint-exact parity")
    # model (:229-239)
    p.add_argument("--model", type=str, default="wengnet_mosei_mult_views_text_missing")
    p.add_argument("--layers", type=str, default="256,128")
    p.add_argument("--full_mse_loss_w", type=float, default=0.5)
    p.add_argument("--missing_mse_loss_w", type=float, default=0.5)
    p.add_argument("--text_feat_loss_w", type=float, default=0.1)
    p.add_argument("--text_query_feat_loss_w", type=float, default=0.7)
    p.add_argument("--features_loss_w", type=float, default=0.1)
    p.add_argument("--rnc_loss_w", type=float, default=0.8)
    # training (:242-249)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--l2", type=float, default=1e-5)
    p.add_argument("--dropout", type=float, default=0.5,
                   help="parsed for recipe parity; like the reference, the "
                        "live model keeps its own default (SURVEY §2.2)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--seed", type=int, default=100)
    p.add_argument("--gpu", type=int, default=0,
                   help="accepted for recipe parity; device selection is JAX's")


def add_tpu_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--synthetic", action="store_true",
                   help="use the deterministic synthetic feature store "
                        "(no dataset on disk required)")
    p.add_argument("--data_parallel", type=int, default=-1)
    p.add_argument("--model_parallel", type=int, default=1)
    p.add_argument("--length_pool", type=int, default=0,
                   help="sort window (in batches) for length-pooled batching")
    p.add_argument("--matmul_precision", type=str, default="highest",
                   choices=["default", "high", "highest"])
    p.add_argument("--checkpoint", type=str, default=None,
                   help=".pt (torch, converted on load) or Orbax dir")
    p.add_argument("--checkpoint_dir", type=str, default="./saved/ckpt")


def args_to_config(args) -> ExperimentConfig:
    layers = tuple(int(x) for x in args.layers.split(","))
    return ExperimentConfig(
        paths=PathsConfig.from_env(args.dataset),
        data=DataConfig(
            dataset=args.dataset,
            # reference defaults test_dataset to dataset (main:261-262)
            train_dataset=args.train_dataset or "",
            test_dataset=args.test_dataset or args.dataset,
            audio_feature=args.audio_feature,
            text_feature=args.text_feature,
            video_feature=args.video_feature,
            feat4_feature=args.feat4_feature,
            feat_type=args.feat_type,
            feat_scale=args.feat_scale,
            feature_dtype=args.feature_dtype,
            batch_size=args.batch_size,
            num_workers=args.num_workers,
            debug=args.debug,
            shuffle_seed=args.seed,
        ),
        model=ModelConfig(
            name=args.model,
            layers=layers,
            matmul_precision=args.matmul_precision,
        ),
        loss=LossConfig(
            full_mse_w=args.full_mse_loss_w,
            missing_mse_w=args.missing_mse_loss_w,
            text_feat_w=args.text_feat_loss_w,
            text_query_feat_w=args.text_query_feat_loss_w,
            features_w=args.features_loss_w,
            rnc_w=args.rnc_loss_w,
        ),
        train=TrainConfig(
            lr=args.lr,
            l2=args.l2,
            epochs=args.epochs,
            seed=args.seed,
            checkpoint_dir=args.checkpoint_dir,
        ),
        mesh=MeshConfig(
            data_parallel=args.data_parallel,
            model_parallel=args.model_parallel,
        ),
    )


def build_model_and_params(cfg: ExperimentConfig, input_dims, checkpoint=None):
    """Construct the fusion model + params (fresh init or checkpoint)."""
    import dataclasses as dc

    import jax
    import jax.numpy as jnp

    from sdumc_tpu.models import get_model

    mcfg = dc.replace(cfg.model, input_dims=tuple(input_dims[:3]))
    model = get_model(mcfg)
    dummy = tuple(jnp.zeros((2, 4, d), jnp.float32) for d in mcfg.input_dims)
    params = model.init(jax.random.PRNGKey(cfg.train.seed), *dummy)["params"]
    if checkpoint:
        if checkpoint.endswith(".pt"):
            from sdumc_tpu.convert import load_torch_checkpoint

            params, report = load_torch_checkpoint(checkpoint, params)
            print(
                f"loaded torch checkpoint {checkpoint}: "
                f"{len(report['unmapped'])} unmapped, {len(report['missing'])} missing"
            )
        else:
            from sdumc_tpu.train.loop import load_checkpoint

            params = load_checkpoint(checkpoint)["params"]
            print(f"loaded orbax checkpoint {checkpoint}")
    return model, params
