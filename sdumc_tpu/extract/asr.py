"""Whisper ASR: wav dir -> transcription.csv (the text extractor's input).

Produces the transcripts behind the reference's ASR text-variant recipes
(``-gt(base.en_vad)`` sweeps, shell/main_text_missing_icassp_inference.sh:6-9
— the reference consumes such features but ships no ASR code; config.py:50-57
only points at external binaries). Pipeline:

  wav -> ops/mel.log_mel_spectrogram (30 s window) -> WhisperEncoder ->
  jitted greedy decode lockstep over a clip batch
  (models/whisper.greedy_transcribe) -> tokenizer.decode -> csv with an
  ``english`` column, byte-compatible with preprocess/cmumosei.py's
  transcription.csv and extract/text.py::read_transcripts.

Batching: clips share the fixed 30 s mel window, so every batch compiles
ONE program (no length buckets needed — Whisper's recipe pads everything
to the window). ``--batch`` clips decode in lockstep until all hit EOS.

    python -m sdumc_tpu.extract.asr --model_dir /ckpts/whisper-base.en \
        --audio_dir wavs/ --save_csv transcription.csv [--batch 8]
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import List

import numpy as np


def transcribe_dir(model_dir: str, audio_dir: str, save_csv: str,
                   batch: int = 8, max_new_tokens: int = 200,
                   language_column: str = "english") -> List[tuple]:
    import jax
    import jax.numpy as jnp

    from sdumc_tpu.convert.hf_whisper import load_hf_whisper
    from sdumc_tpu.models.whisper import WhisperModel, greedy_transcribe
    from sdumc_tpu.extract.audio import read_wav
    from sdumc_tpu.ops.mel import log_mel_spectrogram

    cfg, params, meta = load_hf_whisper(model_dir)
    model = WhisperModel(cfg)

    from transformers import WhisperTokenizerFast

    try:
        tok = WhisperTokenizerFast.from_pretrained(model_dir)
    except Exception:
        from transformers import WhisperTokenizer

        tok = WhisperTokenizer.from_pretrained(model_dir)

    def apply_fn(method, *a, **kw):
        return model.apply({"params": params}, *a,
                           method=getattr(WhisperModel, method), **kw)

    run = jax.jit(lambda m: greedy_transcribe(
        apply_fn, m, cfg,
        start_id=meta["decoder_start_token_id"],
        eos_id=meta["eos_token_id"],
        max_new_tokens=max_new_tokens,
        forced_ids=tuple((int(p), int(t))
                         for p, t in meta["forced_decoder_ids"]),
        suppress_ids=tuple(meta["suppress_tokens"]),
        begin_suppress_ids=tuple(meta["begin_suppress_tokens"]),
    ))

    names = sorted(os.path.splitext(f)[0] for f in os.listdir(audio_dir)
                   if f.endswith(".wav"))
    rows = []
    for i in range(0, len(names), batch):
        group = names[i:i + batch]
        mels = []
        for n in group:
            # 16 kHz mono wavs — the preprocess pipeline's clip-split output
            # (preprocess/cmumosei.py)
            wav = read_wav(os.path.join(audio_dir, n + ".wav"))
            mels.append(np.asarray(
                log_mel_spectrogram(wav, n_mels=cfg.num_mel_bins)))
        # partial tail batch: pad with silence rows so the one compiled
        # program serves every batch; extra rows are dropped
        while len(mels) < batch and len(names) > batch:
            mels.append(np.zeros_like(mels[0]))
        out = run(jnp.asarray(np.stack(mels)))
        toks = np.asarray(out["tokens"])
        for j, n in enumerate(group):
            ids = [int(t) for t in toks[j][:int(out["n_tokens"][j])]]
            text = tok.decode(ids, skip_special_tokens=True).strip()
            rows.append((n, text))
            print(f"{n}: {text}")

    os.makedirs(os.path.dirname(save_csv) or ".", exist_ok=True)
    with open(save_csv, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["name", language_column])
        w.writerows(rows)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model_dir", required=True,
                   help="local HF Whisper checkpoint dir (e.g. base.en)")
    p.add_argument("--audio_dir", required=True)
    p.add_argument("--save_csv", required=True)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--max_new_tokens", type=int, default=200)
    args = p.parse_args(argv)
    transcribe_dir(args.model_dir, args.audio_dir, args.save_csv,
                   batch=args.batch, max_new_tokens=args.max_new_tokens)


if __name__ == "__main__":
    main()
