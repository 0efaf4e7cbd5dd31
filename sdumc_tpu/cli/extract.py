"""Feature-extraction orchestrator: one entry point for all L1 stages.

    python -m sdumc_tpu.cli.extract audio   --model_dir ... --audio_dir ... --save_dir ...
    python -m sdumc_tpu.cli.extract text    --model_dir ... --trans_path ... --save_dir ...
    python -m sdumc_tpu.cli.extract feat4   --llm_dir ... --projector_path ... --wavlm_dir ... --save_dir ...
    python -m sdumc_tpu.cli.extract visual  --checkpoint ... --face_dir ... --save_dir ...
    python -m sdumc_tpu.cli.extract vision  --model_dir ... --face_dir ... --save_dir ...
    python -m sdumc_tpu.cli.extract asr     --model_dir ... --audio_dir ... --save_csv ...
    python -m sdumc_tpu.cli.extract pack    --src_dir ... --out_prefix ...

Each stage mirrors a reference extraction script (see extract/ module
docstrings for the file:line citations).
"""

from __future__ import annotations

import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 1
    stage, rest = argv[0], argv[1:]
    if stage == "audio":
        from sdumc_tpu.extract.audio import main as run
    elif stage == "text":
        from sdumc_tpu.extract.text import main as run
    elif stage == "feat4":
        from sdumc_tpu.extract.llm4wav import main as run
    elif stage == "visual":
        from sdumc_tpu.extract.visual import main as run
    elif stage == "vision":
        # CLIP/ImageNet alternative visual encoders (extract/vision_hf.py)
        from sdumc_tpu.extract.vision_hf import main as run
    elif stage == "asr":
        # Whisper wav -> transcription.csv (the ASR text-variant recipes)
        from sdumc_tpu.extract.asr import main as run
    elif stage == "manet_train":
        from sdumc_tpu.extract.manet_train import main as run
    elif stage == "pack":
        import argparse

        from sdumc_tpu.data.packed import pack_features

        p = argparse.ArgumentParser()
        p.add_argument("--src_dir", required=True)
        p.add_argument("--out_prefix", required=True)
        p.add_argument("--dtype", default="float32",
                       choices=("float32", "bfloat16", "int8"),
                       help="blob payload dtype; bfloat16 halves disk and "
                            "host-pipeline bytes (the production training "
                            "path consumes bf16 features anyway); int8 "
                            "halves them again (per-clip per-channel "
                            "scales, dequantized on device — see "
                            "data/packed.py)")
        a = p.parse_args(rest)
        print(pack_features(a.src_dir, a.out_prefix, dtype=a.dtype))
        return 0
    else:
        print(__doc__)
        return 1
    return run(rest)


if __name__ == "__main__":
    sys.exit(main() or 0)
