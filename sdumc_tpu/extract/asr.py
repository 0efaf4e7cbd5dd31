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
from typing import List, Tuple

import numpy as np


def energy_vad(wav: np.ndarray, sr: int = 16000, frame_ms: int = 20,
               threshold_db: float = 12.0, min_voice_ms: int = 200,
               min_gap_ms: int = 300, pad_ms: int = 100) -> List[Tuple[int, int]]:
    """Energy-based voice activity detection -> [(start, end)] in samples.

    The reference's ASR feature names carry a ``_vad`` suffix
    (``-gt(base.en_vad)``): transcription ran on voiced segments, not the
    raw clip. A frame is voiced when its RMS energy sits ``threshold_db``
    above the clip's noise floor (10th-percentile frame energy); voiced
    runs shorter than ``min_voice_ms`` are dropped, gaps shorter than
    ``min_gap_ms`` merged, and ``pad_ms`` of context kept on each side.
    Returns the whole clip when nothing clears the floor (silence-only
    clips still get transcribed — matching the robust-extractor policy)."""
    hop = sr * frame_ms // 1000
    n = len(wav) // hop
    if n == 0:
        return [(0, len(wav))]
    frames = wav[: n * hop].reshape(n, hop)
    db = 10.0 * np.log10(np.mean(frames ** 2, axis=1) + 1e-10)
    floor = np.percentile(db, 10.0)
    voiced = db > floor + threshold_db
    segs: List[Tuple[int, int]] = []
    start = None
    for i, v in enumerate(voiced):
        if v and start is None:
            start = i
        elif not v and start is not None:
            segs.append((start, i))
            start = None
    if start is not None:
        segs.append((start, n))
    # merge close segments, drop micro-bursts
    merged: List[Tuple[int, int]] = []
    gap = max(1, min_gap_ms // frame_ms)
    for s, e in segs:
        if merged and s - merged[-1][1] <= gap:
            merged[-1] = (merged[-1][0], e)
        else:
            merged.append((s, e))
    keep = max(1, min_voice_ms // frame_ms)
    pad = max(0, pad_ms // frame_ms)
    out = [(max(0, s - pad) * hop, min(n, e + pad) * hop)
           for s, e in merged if e - s >= keep]
    return out or [(0, len(wav))]


def transcribe_dir(model_dir: str, audio_dir: str, save_csv: str,
                   batch: int = 8, max_new_tokens: int = 200,
                   language_column: str = "english",
                   vad: bool = False) -> List[tuple]:
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
    # work items: (clip name, segment order, wav slice) — with --vad each
    # voiced segment decodes as its own row (the recipe's _vad suffix),
    # then segments re-join in order per clip
    from sdumc_tpu.ops.mel import CHUNK_SECONDS, SAMPLE_RATE

    window = CHUNK_SECONDS * SAMPLE_RATE
    items = []
    for n in names:
        # 16 kHz mono wavs — the preprocess pipeline's clip-split output
        # (preprocess/cmumosei.py)
        wav = read_wav(os.path.join(audio_dir, n + ".wav"))
        spans = energy_vad(wav) if vad else [(0, len(wav))]
        # Whisper's window is 30 s; anything longer would silently
        # truncate (MOSEI's long tail exceeds 60 s — the clips the
        # reference deletes). Split over-window spans into window-sized
        # chunks; transcripts re-join in order below.
        j = 0
        for s, e in spans:
            for cs in range(s, e, window):
                items.append((n, j, wav[cs:min(cs + window, e)]))
                j += 1

    pieces: dict = {}
    for i in range(0, len(items), batch):
        group = items[i:i + batch]
        mels = [np.asarray(log_mel_spectrogram(w, n_mels=cfg.num_mel_bins))
                for _, _, w in group]
        # partial tail batch: pad with silence rows so the one compiled
        # program serves every batch; extra rows are dropped
        while len(mels) < batch and len(items) > batch:
            mels.append(np.zeros_like(mels[0]))
        out = run(jnp.asarray(np.stack(mels)))
        toks = np.asarray(out["tokens"])
        for j, (n, seg, _) in enumerate(group):
            ids = [int(t) for t in toks[j][:int(out["n_tokens"][j])]]
            text = tok.decode(ids, skip_special_tokens=True).strip()
            pieces.setdefault(n, []).append((seg, text))

    rows = []
    for n in names:
        text = " ".join(t for _, t in sorted(pieces.get(n, [])) if t).strip()
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
    p.add_argument("--vad", action="store_true",
                   help="energy VAD: transcribe voiced segments and join "
                        "(the reference recipes' _vad suffix)")
    args = p.parse_args(argv)
    transcribe_dir(args.model_dir, args.audio_dir, args.save_csv,
                   batch=args.batch, max_new_tokens=args.max_new_tokens,
                   vad=args.vad)


if __name__ == "__main__":
    main()
