"""Export a serving bundle: checkpoint -> StableHLO dual-view programs.

    python -m sdumc_tpu.cli.export --checkpoint mosei_..._17.pt \
        --out_dir ./bundle --batch_size 128 \
        --combos 64x64x64x64,256x64x256x64,512x64x512x64 \
        [--platforms tpu,cpu]

``--checkpoint`` accepts the released torch ``.pt`` (auto-converted, same
path as cli/infer.py) or an Orbax dir. The bundle serves from any process
with jax installed — no model code or conversion at serving time
(sdumc_tpu/serve/export.py).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--combos", type=str,
                   default="64x64x64x64,256x64x256x64,512x64x512x64",
                   help="comma list of audio x text x video x feat4 buckets")
    p.add_argument("--platforms", type=str, default="tpu,cpu",
                   help="comma list baked into the artifact (cross-platform "
                        "lowering works from any host); 'native' = current "
                        "backend only")
    p.add_argument("--input_dims", type=str, default="1024,4096,1024,4096")
    args = p.parse_args(argv)

    from sdumc_tpu.cli.common import build_model_and_params
    from sdumc_tpu.core.config import ExperimentConfig
    from sdumc_tpu.serve import ServingBundle

    dims = tuple(int(x) for x in args.input_dims.split(","))
    combos = [tuple(int(x) for x in c.split("x"))
              for c in args.combos.split(",")]
    platforms = (None if args.platforms == "native"
                 else args.platforms.split(","))

    model, params = build_model_and_params(
        ExperimentConfig(), dims, args.checkpoint)
    bundle = ServingBundle.build(model, params, dims, combos,
                                 args.batch_size, platforms)
    bundle.save(args.out_dir)
    print(f"exported {len(combos)} programs (bs={args.batch_size}) "
          f"-> {args.out_dir}")


if __name__ == "__main__":
    main()
