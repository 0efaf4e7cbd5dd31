"""Inference / evaluation entry point.

Counterpart of ``main_frame_val_text_missing_inference.py``: load a
checkpoint (a reference ``.pt`` — converted on the fly — or an Orbax dir),
run eval-only passes over train/val/test with both views
(inference.py:376-390), print ``eval_mosei_metric`` for full and missing
(:405-406), and optionally dump the 8 embedding streams (:163-175) with
``--savewhole``.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from sdumc_tpu.cli.common import add_reference_args, add_tpu_args, args_to_config, build_model_and_params


def run_embedding_eval(model, params, dataset, cfg, mesh=None):
    """Eval pass that additionally harvests the embedding streams
    (inference.py:163-175): full/missing x {rep, rnc, text_query, text}."""
    import jax

    from sdumc_tpu.data.pipeline import BatchIterator
    from sdumc_tpu.train.loop import _pad_partial
    from sdumc_tpu.train.step import batch_to_device_dict

    @jax.jit
    def step(params, batch):
        ta, tt, tv, tf4 = batch["t_max"]
        v0, a0 = model.apply({"params": params}, batch["audio"], batch["text"],
                             batch["video"], t_max=(ta, tt, tv),
                             missing=False, deterministic=True)
        v1, a1 = model.apply({"params": params}, batch["audio"], batch["feat4"],
                             batch["video"], t_max=(ta, tf4, tv),
                             missing=True, deterministic=True)
        keep = ("features", "rnc", "text_feat", "text_query_feat")
        return (v0.reshape(-1), v1.reshape(-1),
                {k: a0[k] for k in keep}, {k: a1[k] for k in keep})

    out = {
        "val_preds_full": [], "val_preds_missing": [], "val_labels": [],
        "names": [],
        "full_rep": [], "missing_rep": [], "full_rnc": [], "missing_rnc": [],
        "text_rep_query_full": [], "text_rep_query_missing": [],
        "text_rep_full": [], "text_rep_missing": [],
    }
    it = BatchIterator(dataset, cfg.data.batch_size, shuffle=False,
                       buckets=cfg.data.length_buckets)
    for batch in it:
        padded, n = _pad_partial(batch, cfg.data.batch_size)
        d = batch_to_device_dict(padded, mesh, feature_dtype=cfg.data.feature_dtype)
        v0, v1, a0, a1 = step(params, d)
        out["val_preds_full"].append(np.asarray(v0)[:n])
        out["val_preds_missing"].append(np.asarray(v1)[:n])
        out["val_labels"].append(batch.vals)
        out["names"].extend(batch.names)
        out["full_rep"].append(np.asarray(a0["features"])[:n])
        out["missing_rep"].append(np.asarray(a1["features"])[:n])
        out["full_rnc"].append(np.asarray(a0["rnc"])[:n])
        out["missing_rnc"].append(np.asarray(a1["rnc"])[:n])
        out["text_rep_query_full"].append(np.asarray(a0["text_feat"])[:n])
        out["text_rep_query_missing"].append(np.asarray(a1["text_feat"])[:n])
        out["text_rep_full"].append(np.asarray(a0["text_query_feat"])[:n])
        out["text_rep_missing"].append(np.asarray(a1["text_query_feat"])[:n])
    for k, v in out.items():
        if k != "names":
            out[k] = np.concatenate(v, axis=0)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_reference_args(parser)
    add_tpu_args(parser)
    args = parser.parse_args(argv)
    cfg = args_to_config(args)

    import jax

    from sdumc_tpu.core.metrics import eval_mosei_metric
    from sdumc_tpu.data.pipeline import get_loaders
    from sdumc_tpu.parallel import make_mesh
    from sdumc_tpu.train.loop import run_eval
    from sdumc_tpu.train.step import make_eval_step

    train_ds, eval_ds, test_ds = get_loaders(cfg.data.dataset, cfg.data, cfg.paths,
                                              synthetic=args.synthetic)
    model, params = build_model_and_params(cfg, train_ds.input_dims(), args.checkpoint)
    mesh = make_mesh(cfg.mesh.data_parallel, cfg.mesh.model_parallel) if len(jax.devices()) > 1 else None

    if args.savewhole:
        results = run_embedding_eval(model, params, test_ds, cfg, mesh)
        os.makedirs(args.save_root, exist_ok=True)
        save_path = os.path.join(args.save_root, "test_embeddings.npz")
        np.savez_compressed(save_path, **{k: v for k, v in results.items() if k != "names"})
        print(f"saved embeddings -> {save_path}")
    else:
        eval_step = make_eval_step(model)
        results = run_eval(eval_step, params, test_ds, cfg, mesh)

    m_full = eval_mosei_metric(results["val_preds_full"], results["val_labels"])
    m_missing = eval_mosei_metric(results["val_preds_missing"], results["val_labels"])
    print("test full:")
    print(m_full)
    print("test missing:")
    print(m_missing)
    return {"full": m_full, "missing": m_missing}


if __name__ == "__main__":
    main()
