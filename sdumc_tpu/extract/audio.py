"""Audio feature extraction: raw wav -> SSL-encoder layer-tap features.

Reference (feature_extraction/audio/extract_transformers_embedding.py):
one-wav-at-a-time HF forward, ``hidden_states`` stacked and summed over
``layer_ids=[-5]`` (:125), FRAME keeps [T, 1024] / UTTERANCE mean-pools
(:100-108), output dir pattern ``{model}-FRA_-5`` (:137-138).

TPU rebuild: wavs are normalized like Wav2Vec2FeatureExtractor
(zero-mean/unit-variance), bucketed by length, zero-padded, and run as
*batches* through one jitted WavLM forward with a frame mask — identical
outputs to per-clip extraction (tests/test_wavlm.py).
"""

from __future__ import annotations

import argparse
import glob
import os
import time
import wave
from typing import List, Sequence

import numpy as np


def read_wav(path: str) -> np.ndarray:
    """Minimal 16-bit PCM wav reader (stdlib `wave`; soundfile not baked in)."""
    with wave.open(path, "rb") as f:
        n = f.getnframes()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    return data


def zero_mean_unit_var(x: np.ndarray) -> np.ndarray:
    """Wav2Vec2FeatureExtractor's do_normalize (the reference's processor
    call at extract_transformers_embedding.py:76-82)."""
    return (x - x.mean()) / np.sqrt(x.var() + 1e-7)


def extract_audio_features(
    model,
    params,
    cfg,
    wavs: List[np.ndarray],
    *,
    layer_ids: Sequence[int] = (-5,),
    feature_level: str = "FRAME",
    batch_size: int = 8,
    buckets: Sequence[int] = (40000, 80000, 160000, 320000, 640000),
    dtype: str = "float32",
) -> List[np.ndarray]:
    """Returns one [T_i, D] (or [D] for UTTERANCE) array per input wav."""
    import jax
    import jax.numpy as jnp

    # params ride as a jit argument (closure capture would bake the ~1.2 GB
    # WavLM-large weights into every bucket's HLO as constants); asarray
    # leaves already-placed (e.g. TP-sharded) jax.Arrays untouched.
    # dtype="bfloat16" casts params + waves so every matmul runs MXU-native
    # (the TPU analogue of the reference's fp16-for-LLMs; float32 matches
    # HF bit-for-bit and stays the default); taps are returned in f32.
    wd = jnp.dtype(dtype)
    params = jax.tree_util.tree_map(
        lambda x: (x.astype(wd) if isinstance(x, jax.Array)
                   else jnp.asarray(x, wd)), params)

    @jax.jit
    def run_p(p, batch, frame_mask):
        out = model.apply({"params": p}, batch.astype(wd),
                          pad_mask=frame_mask, output_hidden_states=True)
        hs = out["hidden_states"]
        idxs = {i % len(hs) for i in layer_ids if -len(hs) <= i < len(hs)}
        return sum(hs[i].astype(jnp.float32) for i in sorted(idxs))

    def run(batch, frame_mask):
        return run_p(params, batch, frame_mask)

    # Frame-budget batching keeps the einsum path (O(B*T^2) memory for the
    # [B,H,T,T] gated bias) inside HBM. attention_impl="auto" runs XLA's
    # einsum for short clips and the factored-bias flash kernel (O(T)
    # HBM, ops/pallas/flash_wavlm.py) from cfg.flash_min_frames up —
    # measured faster at every long regime (WavLMConfig comment) —
    # so extreme clips need neither tiny batches nor the reference's
    # 51-longest-clip deletion, at ANY length.
    frame_budget = batch_size * cfg.output_length(buckets[1])
    order = np.argsort([len(w) for w in wavs], kind="stable")
    results: List = [None] * len(wavs)
    chunks = []
    cur: List[int] = []
    for i in order:
        t = cfg.output_length(len(wavs[i]))
        cap = max(1, frame_budget // max(t, 1))
        if cur and len(cur) >= max(1, min(batch_size, cap)):
            chunks.append(cur)
            cur = []
        cur.append(i)
    if cur:
        chunks.append(cur)
    for chunk in chunks:
        group = [zero_mean_unit_var(wavs[i]) for i in chunk]
        maxlen = max(len(w) for w in group)
        bucket = next((b for b in buckets if maxlen <= b), maxlen)
        batch = np.zeros((len(group), bucket), np.float32)
        frame_len = [cfg.output_length(len(w)) for w in group]
        t_bucket = cfg.output_length(bucket)
        mask = np.zeros((len(group), t_bucket), bool)
        for j, w in enumerate(group):
            batch[j, : len(w)] = w
            mask[j, : frame_len[j]] = True
        feats = np.asarray(run(jnp.asarray(batch), jnp.asarray(mask)))
        for j, i in enumerate(chunk):
            f = feats[j, : frame_len[j]]
            if feature_level == "UTTERANCE":
                f = f.mean(axis=0)
            results[i] = f.astype(np.float32)
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_dir", type=str, required=True,
                        help="HF WavLM checkpoint dir (e.g. .../wavlm-large)")
    parser.add_argument("--audio_dir", type=str, required=True)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--model_name", type=str, default="wavlm-large")
    parser.add_argument("--feature_level", type=str, default="FRAME",
                        choices=["FRAME", "UTTERANCE"])
    parser.add_argument("--layer_ids", type=str, default="-5")
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--attention_impl", type=str, default="auto",
                        choices=["auto", "einsum", "flash"],
                        help="flash = factored-bias Pallas kernel, O(T) HBM")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16 = MXU-native fast path (the TPU "
                             "analogue of the reference's fp16-for-LLMs, "
                             "extract_text_embedding_huggingface.py:193-196); "
                             "float32 matches HF exactly")
    parser.add_argument("--overwrite", action="store_true", default=True)
    args = parser.parse_args(argv)

    layer_ids = tuple(int(x) for x in args.layer_ids.split(","))
    import dataclasses

    from sdumc_tpu.convert.hf_wavlm import load_hf_wavlm
    from sdumc_tpu.models.wavlm import WavLMModel

    cfg, params = load_hf_wavlm(args.model_dir)
    cfg = dataclasses.replace(cfg, attention_impl=args.attention_impl)
    model = WavLMModel(cfg)

    audio_files = sorted(glob.glob(os.path.join(args.audio_dir, "*.wav")))
    print(f'Find total "{len(audio_files)}" audio files.')
    # output dir naming parity: {model}-{LEVEL[:3]}_{layer} (:137-138)
    dir_name = args.model_name if len(layer_ids) == 1 else f"{args.model_name}-{len(layer_ids)}"
    dir_name = f"{dir_name}-{args.feature_level[:3]}_{layer_ids[0]}"
    save_dir = os.path.join(args.save_dir, dir_name)
    os.makedirs(save_dir, exist_ok=True)

    t0 = time.time()
    wavs = [read_wav(f) for f in audio_files]
    feats = extract_audio_features(
        model, params, cfg, wavs,
        layer_ids=layer_ids, feature_level=args.feature_level,
        batch_size=args.batch_size, dtype=args.dtype,
    )
    for f, feat in zip(audio_files, feats):
        vid = os.path.basename(f).split(".")[0]
        np.save(os.path.join(save_dir, f"{vid}.npy"), feat)
    print(f"Total time used: {time.time() - t0:.1f}s.")


if __name__ == "__main__":
    main()
