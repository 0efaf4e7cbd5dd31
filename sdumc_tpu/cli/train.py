"""Training entry point.

TPU-native counterpart of the reference driver
``main_frame_val_text_missing.py``: dual-view (teacher/student)
self-distillation on CMU-MOSEI features with best-test-MAE model selection.
Shell recipes port directly, e.g. the canonical ICASSP run
(shell/main_text_missing_icassp.sh:6):

    python -m sdumc_tpu.cli.train --dataset=CMU-MOSEI \
        --model=wengnet_mosei_mult_views_text_missing \
        --audio_feature=wavlm-large-FRA_-5 \
        --text_feature=vicuna-7b-v1.5-FRA-wavlm2vicuna-half-gt \
        --video_feature=manet_FRA \
        --feat4_feature='vicuna-7b-v1.5-FRA-wavlm2vicuna-half-wav+prompt[take_generate_wordembed_-4]' \
        --batch_size=96 --lr=1e-4 --epochs=25 \
        --full_mse_loss_w=0.5 --missing_mse_loss_w=0.5 --text_feat_loss_w=0 \
        --text_query_feat_loss_w=0 --features_loss_w=0.13 --rnc_loss_w=0.5

Add ``--synthetic`` to run without a dataset on disk.
"""

from __future__ import annotations

import argparse
import os
import time

from sdumc_tpu.cli.common import add_reference_args, add_tpu_args, args_to_config, build_model_and_params


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_reference_args(parser)
    add_tpu_args(parser)
    parser.add_argument("--resume", type=str, default=None,
                        help="orbax 'latest' checkpoint dir to resume from")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host DP: jax.distributed.initialize "
                             "(coordinator from SDUMC_* env or pod metadata), "
                             "per-host BatchIterator shards, global arrays")
    args = parser.parse_args(argv)
    cfg = args_to_config(args)

    shard = (0, 1)
    if args.multihost:
        # must run before any other jax backend touch
        from sdumc_tpu.parallel.multihost import initialize_from_env

        shard = initialize_from_env()
        print(f"multihost: process {shard[0]}/{shard[1]}")
    print(cfg.to_json())

    import jax

    from sdumc_tpu.data.pipeline import get_loaders
    from sdumc_tpu.parallel import make_mesh
    from sdumc_tpu.train.loop import train

    print("====== Reading Data =======")
    train_ds, eval_ds, test_ds = get_loaders(cfg.data.dataset, cfg.data, cfg.paths,
                                              synthetic=args.synthetic)
    input_dims = train_ds.input_dims()
    print(f"train: {len(train_ds)}  val: {len(eval_ds)}  test: {len(test_ds)}; dims {input_dims}")

    print("====== Training and Evaluation =======")
    model, params = build_model_and_params(cfg, input_dims, args.checkpoint)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model size: {n_params / 1e6:.2f}M params ({n_params * 4 / 2**20:.1f} MB fp32)")

    mesh = None
    if len(jax.devices()) > 1:
        mesh = make_mesh(cfg.mesh.data_parallel, cfg.mesh.model_parallel)
        print(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} devices")

    t0 = time.time()
    result = train(cfg, model, params, train_ds, eval_ds, test_ds, mesh=mesh,
                   resume_from=args.resume, shard=shard,
                   multihost=args.multihost and shard[1] > 1)
    print(f">>>>> Finish: training duration {time.time() - t0:.1f}s >>>>>")
    print("best_test_full:", result["best_full"])
    print("best_test_missing:", result["best_missing"])

    # ablation append-log, reference main:411-416
    os.makedirs(args.save_root, exist_ok=True)
    with open(os.path.join(args.save_root, "features_ablation_study.txt"), "a") as f:
        f.write(
            f"--full_mse_loss_w={cfg.loss.full_mse_w} --missing_mse_loss_w={cfg.loss.missing_mse_w} "
            f"--text_feat_loss_w={cfg.loss.text_feat_w} --text_query_feat_loss_w={cfg.loss.text_query_feat_w} "
            f"--features_loss_w={cfg.loss.features_w} --rnc_loss_w={cfg.loss.rnc_w}\n"
            f"{result['best_full']}\n{result['best_missing']}\n"
        )
    return result


if __name__ == "__main__":
    main()
