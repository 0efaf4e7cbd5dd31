"""Text (ground-truth transcript) feature extraction via an LLM.

Reference (feature_extraction/text/extract_text_embedding_huggingface.py):
per-row tokenizer -> LLM forward, hidden layers [-4..-1] summed (:145,255),
special-token span stripped via a tokenizer probe (:90-114), fp16 for LLMs
(:193-196), multi-GPU via accelerate.dispatch_model (:204-210). The Vicuna
"-gt" variant taps layer -3 (extract_wavlm_vicuna_hd.py:235-241).

TPU rebuild: one jitted LLaMA forward per length bucket; model sharding via
the mesh's model axis replaces dispatch_model. FRAME saves the meaningful
token span [T, D]; UTTERANCE mean-pools.
"""

from __future__ import annotations

import argparse
import csv
import os
import time
from typing import List, Sequence, Tuple

import numpy as np


def find_token_span(tokenizer, probe: str = "today is a good day") -> Tuple[int, int]:
    """Probe the tokenizer for special-token offsets (reference
    find_start_end_pos, :90-114): returns (start, end) such that
    ids[start:end or None] decodes back to the sentence."""
    ids = tokenizer(probe)["input_ids"]
    target = probe.replace(" ", "")
    for start in range(0, 3):
        if tokenizer.decode(ids[start:]).replace(" ", "") == target:
            return start, 0
        if tokenizer.decode(ids[start:]).replace(" ", "").startswith(target):
            break
    for end in range(-1, -3, -1):
        if tokenizer.decode(ids[start:end]).replace(" ", "") == target:
            return start, end
    raise ValueError("could not locate meaningful token span")


def read_transcripts(csv_path: str) -> List[Tuple[str, str]]:
    """transcription csv: columns name,sentence (reference
    toolkit/preprocess/cmumosei.py:71-84 writer)."""
    rows = []
    with open(csv_path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        for row in reader:
            name = row.get("name") or row.get("video_id") or list(row.values())[0]
            sent = row.get("sentence") or row.get("text") or list(row.values())[-1]
            rows.append((str(name), str(sent)))
    return rows


def extract_text_features(
    model,
    params,
    tokenizer,
    sentences: List[str],
    *,
    layer_ids: Sequence[int] = (-4, -3, -2, -1),
    feature_level: str = "FRAME",
    buckets: Sequence[int] = (16, 32, 64, 128, 256),
) -> List[np.ndarray]:
    import jax
    import jax.numpy as jnp

    start, end = find_token_span(tokenizer)

    @jax.jit
    def run(ids, positions, attn_mask):
        out = model.apply({"params": params}, input_ids=ids, positions=positions,
                          attn_mask=attn_mask, output_hidden_states=True)
        hs = out["hidden_states"]
        idxs = {i % len(hs) for i in layer_ids if -len(hs) <= i < len(hs)}
        return sum(hs[i] for i in sorted(idxs))

    results = []
    for sent in sentences:
        ids = tokenizer(sent)["input_ids"]
        n = len(ids)
        bucket = next((b for b in buckets if n <= b), n)
        padded = np.zeros((1, bucket), np.int64)
        padded[0, :n] = ids
        pos = np.arange(bucket)[None]
        causal = np.tril(np.ones((bucket, bucket), bool))
        valid = (np.arange(bucket) < n)[None, :]
        mask = np.where(causal & valid[None], 0.0, -1e30)[None, None]
        feats = np.asarray(run(jnp.asarray(padded), jnp.asarray(pos), jnp.asarray(mask[0])))
        lo = start
        hi = n + end if end else n
        span = feats[0, lo:hi]
        if feature_level == "UTTERANCE":
            span = span.mean(axis=0)
        results.append(span.astype(np.float32))
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--trans_path", type=str, required=True,
                        help="transcription csv (name,sentence)")
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--model_name", type=str, default="vicuna-7b-v1.5")
    parser.add_argument("--feature_level", type=str, default="FRAME")
    parser.add_argument("--layer_ids", type=str, default="-4,-3,-2,-1")
    args = parser.parse_args(argv)

    import transformers

    from sdumc_tpu.convert.hf_llama import load_hf_llama
    from sdumc_tpu.models.llama import LlamaModel

    layer_ids = tuple(int(x) for x in args.layer_ids.split(","))
    cfg, params = load_hf_llama(args.model_dir)
    model = LlamaModel(cfg)
    tokenizer = transformers.AutoTokenizer.from_pretrained(args.model_dir)

    rows = read_transcripts(args.trans_path)
    os.makedirs(args.save_dir, exist_ok=True)
    t0 = time.time()
    feats = extract_text_features(
        model, params["model"], tokenizer, [s for _, s in rows],
        layer_ids=layer_ids, feature_level=args.feature_level,
    )
    for (name, _), feat in zip(rows, feats):
        np.save(os.path.join(args.save_dir, f"{name}.npy"), feat)
    print(f"Total time used: {time.time() - t0:.1f}s.")


if __name__ == "__main__":
    main()
