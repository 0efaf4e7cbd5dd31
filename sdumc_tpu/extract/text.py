"""Text (ground-truth transcript) feature extraction via an LLM.

Reference (feature_extraction/text/extract_text_embedding_huggingface.py):
per-row tokenizer -> LLM forward, hidden layers [-4..-1] summed (:145,255),
special-token span stripped via a tokenizer probe (:90-114), fp16 for LLMs
(:193-196), multi-GPU via accelerate.dispatch_model (:204-210). The Vicuna
"-gt" variant taps layer -3 (extract_wavlm_vicuna_hd.py:235-241).

Families: llama (vicuna/llama2/alpaca), bert (bert/roberta/macbert/simbert),
albert, deberta, bloom, glm (chatglm2-6b / glm-4 lineage; the converter
accepts both THUDM chatglm2 state dicts and HF-native Glm checkpoints, and
the parity oracle is HF ``GlmModel`` — the same architecture chatglm2's
trust_remote_code modeling implements) — each a from-scratch JAX model + HF
converter with tiny-config parity tests.

TPU rebuild: sentences are tokenized up front, grouped into length buckets,
and run through ONE jitted batched forward per bucket (masks built in-graph
from the per-row lengths), so a handful of XLA programs cover the dataset
instead of the reference's one-sentence-at-a-time loop. Tensor-parallel
sharding of the params over the mesh's ``model`` axis
(parallel/sharding.llama_specs) replaces dispatch_model for 7B+ models.
FRAME saves the meaningful token span [T, D]; UTTERANCE mean-pools.
"""

from __future__ import annotations

import argparse
import csv
import os
import time
from typing import List, Optional, Sequence, Tuple

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


def read_transcripts(csv_path: str, language: str = "english") -> List[Tuple[str, str]]:
    """transcription csv: name + {sentence|english|chinese} columns
    (writers: preprocess/cmumosei.py:71-84, preprocess/cmumosi.py; the
    reference extractor picks the column by --language, :222-228)."""
    preferred = {"english": ("english", "sentence", "text"),
                 "chinese": ("chinese", "sentence", "text")}[language]
    rows = []
    with open(csv_path, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        for row in reader:
            name = row.get("name") or row.get("video_id") or list(row.values())[0]
            sent = next((row[c] for c in preferred if row.get(c)), None)
            if sent is None:
                sent = list(row.values())[-1]
            rows.append((str(name), str(sent)))
    return rows


def make_runner(model, params, layer_ids: Sequence[int]):
    """jitted (ids [B,L], lengths [B]) -> layer-summed hidden [B,L,D] for
    any supported family. Decoders (LlamaModel/BloomModel) get a causal +
    key-padding mask; bidirectional encoders (BertModel) only the padding
    mask — batch axis is always 0 here, so the reference's
    find_batchpos_embdim probe (:118-135) is unnecessary by construction."""
    import jax
    import jax.numpy as jnp

    from sdumc_tpu.models.albert import AlbertModel
    from sdumc_tpu.models.bert import BertModel
    from sdumc_tpu.models.bloom import BloomModel
    from sdumc_tpu.models.deberta import DebertaModel
    from sdumc_tpu.models.glm import GlmModel

    def tap_sum(out):
        hs = out["hidden_states"]
        idxs = {i % len(hs) for i in layer_ids if -len(hs) <= i < len(hs)}
        return sum(hs[i] for i in sorted(idxs))

    # params are a jit ARGUMENT, not a closure capture: closed-over arrays
    # are baked into the HLO as constants (multi-GB programs at 7B; remote
    # compile services reject the payload). jnp.asarray leaves already-
    # placed (e.g. TP-sharded) jax.Arrays untouched.
    params = jax.tree_util.tree_map(
        lambda x: x if isinstance(x, jax.Array) else jnp.asarray(x), params)

    if isinstance(model, (BertModel, AlbertModel, DebertaModel, BloomModel,
                          GlmModel)):
        # pad_mask-driven families (BLOOM/GLM build their causal structure
        # in-graph from the key-padding mask)
        @jax.jit
        def run_p(p, ids, lengths):
            key_valid = jnp.arange(ids.shape[1])[None, :] < lengths[:, None]
            return tap_sum(model.apply(
                {"params": p}, ids, pad_mask=key_valid,
                output_hidden_states=True))
        return lambda ids, lengths: run_p(params, ids, lengths)

    @jax.jit
    def run_p(p, ids, lengths):
        B, L = ids.shape
        positions = jnp.broadcast_to(jnp.arange(L)[None], (B, L))
        causal = jnp.tril(jnp.ones((L, L), bool))
        key_valid = jnp.arange(L)[None, :] < lengths[:, None]       # [B, L]
        mask = jnp.where(
            causal[None] & key_valid[:, None, :], 0.0, -1e30
        )[:, None]                                                   # [B,1,L,L]
        out = model.apply({"params": p}, input_ids=ids, positions=positions,
                          attn_mask=mask, output_hidden_states=True)
        return tap_sum(out)

    return lambda ids, lengths: run_p(params, ids, lengths)


def extract_text_features(
    model,
    params,
    tokenizer,
    sentences: List[str],
    *,
    layer_ids: Sequence[int] = (-4, -3, -2, -1),
    feature_level: str = "FRAME",
    buckets: Sequence[int] = (16, 32, 64, 128, 256),
    batch_size: int = 16,
    mesh=None,
) -> List[np.ndarray]:
    """Batched bucketed extraction. Tokenizes everything first, groups rows
    into (bucket_len, batch) tiles, and runs one jitted forward per bucket
    length; pad rows/tokens are masked in-graph, so results are identical to
    per-sentence forwards (pad-invariance is tested). With ``mesh``, params
    are expected pre-sharded and inputs are replicated onto the mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    start, end = find_token_span(tokenizer)
    run = make_runner(model, params, layer_ids)

    def put(x):
        if mesh is None:
            return jnp.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, P()))

    dim = getattr(model.cfg, "hidden_size", 0)
    results: List[Optional[np.ndarray]] = [None] * len(sentences)
    all_ids = []
    by_bucket = {}
    for row, s in enumerate(sentences):
        # empty/NaN transcript -> zeros placeholder (reference :245,258-276)
        if s is None or (isinstance(s, float) and np.isnan(s)) or not str(s).strip():
            results[row] = (np.zeros((1, dim), np.float32)
                            if feature_level == "FRAME"
                            else np.zeros((dim,), np.float32))
            all_ids.append([])
            continue
        ids = tokenizer(str(s))["input_ids"]
        all_ids.append(ids)
        n = len(ids)
        # overlong rows get their own exact-length program — rare, and
        # still batched if several share a length
        bucket = next((b for b in buckets if n <= b), n)
        by_bucket.setdefault(bucket, []).append(row)
    for bucket in sorted(by_bucket):
        rows = by_bucket[bucket]
        for ofs in range(0, len(rows), batch_size):
            chunk = rows[ofs:ofs + batch_size]
            # fixed batch shape: pad the tail chunk with dummy rows so each
            # bucket compiles exactly one program
            ids_np = np.zeros((batch_size, bucket), np.int32)
            len_np = np.zeros((batch_size,), np.int32)
            for j, row in enumerate(chunk):
                ids_np[j, : len(all_ids[row])] = all_ids[row]
                len_np[j] = len(all_ids[row])
            feats = np.asarray(run(put(ids_np), put(len_np)))
            for j, row in enumerate(chunk):
                n = len(all_ids[row])
                span = feats[j, start: n + end if end else n]
                if feature_level == "UTTERANCE":
                    span = span.mean(axis=0)
                results[row] = span.astype(np.float32)
    return results  # type: ignore[return-value]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model_dir", type=str, required=True)
    parser.add_argument("--trans_path", type=str, required=True,
                        help="transcription csv (name,sentence)")
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--model_name", type=str, default="vicuna-7b-v1.5")
    parser.add_argument("--family", type=str, default="llama",
                        choices=["llama", "bert", "albert", "deberta",
                                 "bloom", "glm"],
                        help="llama covers vicuna/llama2/alpaca; bert covers "
                             "bert/roberta/macbert/simbert; glm covers "
                             "chatglm2-6b/glm-4")
    parser.add_argument("--language", type=str, default="english",
                        choices=["english", "chinese"])
    parser.add_argument("--feature_level", type=str, default="FRAME")
    parser.add_argument("--layer_ids", type=str, default="-4,-3,-2,-1")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree over the mesh model axis "
                             "(the dispatch_model replacement for 7B+ models)")
    args = parser.parse_args(argv)

    import transformers

    layer_ids = tuple(int(x) for x in args.layer_ids.split(","))
    if args.family == "bert":
        from sdumc_tpu.convert.hf_bert import load_hf_bert
        from sdumc_tpu.models.bert import BertModel

        cfg, model_params = load_hf_bert(args.model_dir)
        model = BertModel(cfg)
        params = {"model": model_params}
    elif args.family == "albert":
        from sdumc_tpu.convert.hf_albert import load_hf_albert
        from sdumc_tpu.models.albert import AlbertModel

        cfg, model_params = load_hf_albert(args.model_dir)
        model = AlbertModel(cfg)
        params = {"model": model_params}
    elif args.family == "deberta":
        from sdumc_tpu.convert.hf_deberta import load_hf_deberta
        from sdumc_tpu.models.deberta import DebertaModel

        cfg, model_params = load_hf_deberta(args.model_dir)
        model = DebertaModel(cfg)
        params = {"model": model_params}
    elif args.family == "bloom":
        from sdumc_tpu.convert.hf_bloom import load_hf_bloom
        from sdumc_tpu.models.bloom import BloomModel

        cfg, model_params = load_hf_bloom(args.model_dir)
        model = BloomModel(cfg)
        params = {"model": model_params}
    elif args.family == "glm":
        from sdumc_tpu.convert.hf_glm import load_hf_glm
        from sdumc_tpu.models.glm import GlmModel

        cfg, model_params = load_hf_glm(args.model_dir)
        model = GlmModel(cfg)
        params = {"model": model_params}
    else:
        from sdumc_tpu.convert.hf_llama import load_hf_llama
        from sdumc_tpu.models.llama import LlamaModel

        cfg, params = load_hf_llama(args.model_dir)
        model = LlamaModel(cfg)
        model_params = params["model"]
    tokenizer = transformers.AutoTokenizer.from_pretrained(args.model_dir)

    mesh = None
    if args.tp > 1 and args.family == "llama":
        from sdumc_tpu.parallel import make_mesh
        from sdumc_tpu.parallel.sharding import (
            llama_specs, shard_params, tp_sharding_summary)

        mesh = make_mesh(data_parallel=1, model_parallel=args.tp)
        specs = llama_specs(model_params, mesh)
        model_params = shard_params(model_params, mesh, specs)
        print(tp_sharding_summary(model_params, specs))

    rows = read_transcripts(args.trans_path, language=args.language)
    os.makedirs(args.save_dir, exist_ok=True)
    t0 = time.time()
    feats = extract_text_features(
        model, model_params, tokenizer, [s for _, s in rows],
        layer_ids=layer_ids, feature_level=args.feature_level,
        batch_size=args.batch_size, mesh=mesh,
    )
    for (name, _), feat in zip(rows, feats):
        np.save(os.path.join(args.save_dir, f"{name}.npy"), feat)
    print(f"Total time used: {time.time() - t0:.1f}s.")


if __name__ == "__main__":
    main()
