#!/usr/bin/env python
"""Released-checkpoint parity protocol (BASELINE.md target).

The published numbers are full-MSE 0.5060 / text-missing-MSE 0.5503 on the
CMU-MOSEI test split with the released 49 MB checkpoint
(/root/reference/README.md:25-27). Neither the checkpoint nor the extracted
MOSEI features ship with the reference snapshot, and this environment has no
network egress — so the number cannot be *demonstrated* here. This script IS
the protocol: point it at the released artifacts on a machine that has them
and it asserts parity end-to-end through the exact production code path
(torch->jax converter -> bucketed collate -> jitted dual-view eval ->
re-derived eval_mosei_metric). Code-level parity is already proven against
randomly-initialized reference checkpoints to 1e-4 (tests/test_fusion_parity.py,
scripts/verify_drive.py); this closes the data-level gap.

Usage:
  python scripts/parity_protocol.py \
    --ckpt /path/to/mosei_mult-view_kd_full_0.5089_17.pt \
    --label /path/to/CMU-MOSEI.npz \
    --features_dir /path/to/features/CMU-MOSEI \
    [--audio wavlm-large-FRA_-5] [--text ...] [--video ...] [--feat4 ...] \
    [--tol 0.002] [--savewhole DIR] [--asr_variants base.en_vad,...]

Exit code 0 iff |mse_full - 0.5060| <= tol AND |mse_missing - 0.5503| <= tol.

Extended rows (VERDICT r4 item 8) — verified whenever artifacts allow:

* ``--savewhole DIR``: additionally runs the --savewhole embedding dump
  through cli/infer.run_embedding_eval and asserts the 8 released streams
  (full/missing x {rep, rnc, text_query, text}) exist with the published
  widths (reference inference.py:163-175 harvest + its .npz dump) before
  writing ``DIR/test_embeddings.npz``; the report carries each stream's
  shape.
* ``--asr_variants a,b,...``: re-evaluates the full protocol with the text
  feature rewritten to ``{text}({variant})`` for each entry — the whisper
  ASR-text sweep of shell/main_text_missing_icassp_inference.sh:6-9 — and
  reports per-variant MSEs (published numbers exist only for the gt text,
  so variants are reported, not gated).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PUBLISHED = {"full": 0.5060, "missing": 0.5503}  # reference README.md:25-27


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="released reference .pt")
    p.add_argument("--label", required=True, help="MOSEI label npz")
    p.add_argument("--features_dir", required=True,
                   help="root containing one subdir per feature name")
    p.add_argument("--audio", default="wavlm-large-FRA_-5")
    p.add_argument("--text", default="vicuna-7b-v1.5-FRA-wavlm2vicuna-half-gt")
    p.add_argument("--video", default="manet_FRA")
    p.add_argument("--feat4", default=None,
                   help="defaults to the DataConfig feat4 feature name")
    p.add_argument("--tol", type=float, default=0.002)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--savewhole", default=None, metavar="DIR",
                   help="also run the 8-stream embedding dump and verify "
                        "its shapes (see module docstring)")
    p.add_argument("--asr_variants", default=None,
                   help="comma list of whisper variants; each re-evaluates "
                        "with text_feature='{text}({variant})'")
    args = p.parse_args(argv)

    from sdumc_tpu.cli.common import build_model_and_params
    from sdumc_tpu.core.config import DataConfig, ExperimentConfig, PathsConfig
    from sdumc_tpu.core.metrics import eval_mosei_metric
    from sdumc_tpu.data.pipeline import build_loaders
    from sdumc_tpu.train.loop import run_eval
    from sdumc_tpu.train.step import make_eval_step

    def build_cfg(text_feature):
        data_kw = dict(
            batch_size=args.batch_size,
            audio_feature=args.audio, text_feature=text_feature,
            video_feature=args.video,
        )
        if args.feat4:
            data_kw["feat4_feature"] = args.feat4
        return ExperimentConfig(
            data=dataclasses.replace(DataConfig(), **data_kw),
            paths=dataclasses.replace(
                PathsConfig.from_env(),
                features_dir=args.features_dir, label_path=args.label,
            ),
        )

    def evaluate(cfg):
        _, _, test_ds = build_loaders(cfg.data, cfg.paths)
        model, params = build_model_and_params(
            cfg, test_ds.input_dims(), args.ckpt)
        results = run_eval(make_eval_step(model), params, test_ds, cfg)
        return model, params, test_ds, results

    cfg = build_cfg(args.text)
    model, params, test_ds, results = evaluate(cfg)
    mse_full = results["val_mse_full"]
    mse_missing = results["val_mse_missing"]
    m_full = eval_mosei_metric(
        results["val_preds_full"], results["val_labels"], results["names"])
    m_missing = eval_mosei_metric(
        results["val_preds_missing"], results["val_labels"], results["names"])

    ok_full = abs(mse_full - PUBLISHED["full"]) <= args.tol
    ok_missing = abs(mse_missing - PUBLISHED["missing"]) <= args.tol
    blob = {
        "mse_full": round(mse_full, 4),
        "mse_missing": round(mse_missing, 4),
        "published": PUBLISHED,
        "tol": args.tol,
        "mae_full": round(m_full["mae"], 4),
        "mae_missing": round(m_missing["mae"], 4),
        "parity": bool(ok_full and ok_missing),
    }

    if args.savewhole:
        # the released dump is 8 streams of known widths: rep = the fused
        # feature (layers[-1]), rnc = the projection head (rnc_proj_dim),
        # text_query = the post-query-MLP text hidden (general_dim),
        # text = cross_hiddens[:, 1] ([7, layers[-1]])
        import numpy as np

        from sdumc_tpu.cli.infer import run_embedding_eval

        emb = run_embedding_eval(model, params, test_ds, cfg)
        n = len(emb["names"])
        mc = cfg.model
        want = {
            "full_rep": (n, mc.layers[-1]),
            "missing_rep": (n, mc.layers[-1]),
            "full_rnc": (n, mc.rnc_proj_dim),
            "missing_rnc": (n, mc.rnc_proj_dim),
            "text_rep_query_full": (n, mc.general_dim),
            "text_rep_query_missing": (n, mc.general_dim),
            "text_rep_full": (n, 7, mc.layers[-1]),
            "text_rep_missing": (n, 7, mc.layers[-1]),
        }
        shapes = {}
        for k, shape in want.items():
            got = tuple(emb[k].shape)
            assert got == shape, (k, got, shape)
            shapes[k] = list(got)
        os.makedirs(args.savewhole, exist_ok=True)
        np.savez_compressed(
            os.path.join(args.savewhole, "test_embeddings.npz"),
            **{k: v for k, v in emb.items() if k != "names"})
        blob["savewhole_streams"] = shapes

    if args.asr_variants:
        # whisper ASR sweep (shell/main_text_missing_icassp_inference.sh:6-9):
        # the gt text feature name gains a "(variant)" suffix per row
        blob["asr_variants"] = {}
        for variant in args.asr_variants.split(","):
            vcfg = build_cfg(f"{args.text}({variant})")
            _, _, _, vres = evaluate(vcfg)
            blob["asr_variants"][variant] = {
                "mse_full": round(vres["val_mse_full"], 4),
                "mse_missing": round(vres["val_mse_missing"], 4),
            }

    print(json.dumps(blob))
    return 0 if (ok_full and ok_missing) else 1


if __name__ == "__main__":
    sys.exit(main())
