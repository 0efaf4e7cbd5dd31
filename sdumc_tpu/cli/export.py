"""Export a serving bundle: checkpoint -> StableHLO programs.

Dual-view fusion eval (default):

    python -m sdumc_tpu.cli.export --checkpoint mosei_..._17.pt \
        --out_dir ./bundle --batch_size 128 \
        --combos 64x64x64x64,256x64x256x64,512x64x512x64 \
        [--platforms tpu,cpu]

``--checkpoint`` accepts the released torch ``.pt`` (auto-converted, same
path as cli/infer.py) or an Orbax dir.

Beam-decode extractor (``--decode``): exports the whole feat4 beam-4
engine (while_loop, split KV cache, per-step taps) from an HF LLaMA/Vicuna
checkpoint dir:

    python -m sdumc_tpu.cli.export --decode --llm_dir .../vicuna-7b-v1.5 \
        --out_dir ./decode_bundle --prompt_buckets 64,128,256 \
        --gen_batch 8 [--quant w8a8 --kv_quant int8]

Either bundle serves from any process with jax installed — no model code
or conversion at serving time (sdumc_tpu/serve/export.py).
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
    # ---- beam-decode bundle mode
    p.add_argument("--decode", action="store_true",
                   help="export the feat4 beam-decode engine instead of "
                        "the fusion eval")
    p.add_argument("--llm_dir", type=str, default=None,
                   help="HF LLaMA/Vicuna checkpoint dir (--decode)")
    p.add_argument("--prompt_buckets", type=str, default="64,128,256")
    p.add_argument("--gen_batch", type=int, default=8)
    p.add_argument("--num_beams", type=int, default=4)
    p.add_argument("--max_new_tokens", type=int, default=200)
    p.add_argument("--quant", type=str, default=None,
                   choices=(None, "int8", "w8a8"))
    p.add_argument("--kv_quant", type=str, default=None,
                   choices=(None, "int8"))
    args = p.parse_args(argv)

    platforms = (None if args.platforms == "native"
                 else args.platforms.split(","))

    if args.decode:
        import dataclasses

        from sdumc_tpu.convert.hf_llama import load_hf_llama, stack_scan_layers
        from sdumc_tpu.serve.export import DecodeBundle

        assert args.llm_dir, "--decode needs --llm_dir"
        cfg, params = load_hf_llama(args.llm_dir)
        cfg = dataclasses.replace(
            cfg, scan_layers=True, quant=args.quant, kv_quant=args.kv_quant)
        params = stack_scan_layers(params)
        if args.quant:
            from sdumc_tpu.ops.quant import quantize_params

            params = quantize_params(params, mode=args.quant)
        buckets = tuple(int(b) for b in args.prompt_buckets.split(","))
        bundle = DecodeBundle.build(
            cfg, params, buckets=buckets, gen_batch=args.gen_batch,
            num_beams=args.num_beams, max_new_tokens=args.max_new_tokens,
            platforms=platforms)
        bundle.save(args.out_dir)
        print(f"exported {len(buckets)} decode programs "
              f"(gen_batch={args.gen_batch}, beams={args.num_beams}) "
              f"-> {args.out_dir}")
        return

    from sdumc_tpu.cli.common import build_model_and_params
    from sdumc_tpu.core.config import ExperimentConfig
    from sdumc_tpu.serve import ServingBundle

    dims = tuple(int(x) for x in args.input_dims.split(","))
    combos = [tuple(int(x) for x in c.split("x"))
              for c in args.combos.split(",")]

    model, params = build_model_and_params(
        ExperimentConfig(), dims, args.checkpoint)
    bundle = ServingBundle.build(model, params, dims, combos,
                                 args.batch_size, platforms)
    bundle.save(args.out_dir)
    print(f"exported {len(combos)} programs (bs={args.batch_size}) "
          f"-> {args.out_dir}")


if __name__ == "__main__":
    main()
