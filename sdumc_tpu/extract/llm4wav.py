"""The llm4wav bridge: audio-derived pseudo-text (feat4) extraction.

Reference (feature_extraction/llm4wav/extract_wavlm_vicuna.py): per clip,
WavLM features [T, 1024] -> frozen EncoderProjectorConcat (k=5 -> 4096)
-> concat with the tokenized ASR prompt -> frozen fp16 Vicuna ``generate``
(beam 4, <=200 new tokens) -> per-step last-4-layer hidden states of the
leading beam = feat4 [T_gen, 4096] saved as
``...-wav+prompt[take_generate_wordembed_-4]/{clip}.npy`` (:245-264,335-343).
The ``_hd`` variant embeds the ground-truth transcript tokens instead and
takes one forward's layer -3 -> the "-gt" text feature (hd:235-252).

TPU rebuild: the projector, prompt concat, and the whole beam search run as
jitted programs (models/generation.py); prompt lengths are bucketed so a
handful of compiled programs cover the dataset, and ``--gen_batch`` decodes
several clips per program in lockstep (beam_generate_batched — decode is
weight-read-bound, so tokens/s scales ~linearly with the clip batch where
the reference generates strictly one clip at a time).
"""

from __future__ import annotations

import argparse
import glob
import os
import time
from typing import Dict, List, Optional, Sequence

import numpy as np

DEFAULT_PROMPT = "Transcribe speech to text. "


def _bucket(n: int, buckets: Sequence[int]) -> int:
    return next((b for b in buckets if n <= b), n)


class Feat4Extractor:
    """WavLM features -> projector -> prompt concat -> beam generate -> taps."""

    def __init__(self, llama_model, llama_params, llama_cfg, projector_params,
                 tokenizer, *, num_beams: int = 4, max_new_tokens: int = 200,
                 tap_layers=(-4, -3, -2, -1), prompt: str = DEFAULT_PROMPT,
                 prompt_buckets: Sequence[int] = (64, 128, 256, 512),
                 gen_batch: int = 1, tp: int = 1):
        import jax
        import jax.numpy as jnp

        from sdumc_tpu.extract.projector import EncoderProjectorConcat
        from sdumc_tpu.models.generation import beam_generate_batched

        self.cfg = llama_cfg
        self.tokenizer = tokenizer
        self.prompt_buckets = prompt_buckets
        self.num_beams = num_beams
        self.max_new_tokens = max_new_tokens
        self.gen_batch = max(1, gen_batch)
        self.proj_k = 5

        projector = EncoderProjectorConcat(llm_dim=llama_cfg.hidden_size)
        embedding = np.asarray(llama_params["model"]["embed_tokens"]["embedding"])

        prompt_ids = tokenizer(prompt)["input_ids"] if tokenizer else []
        self._prompt_embeds = (
            embedding[np.asarray(prompt_ids)].astype(np.float32)
            if len(prompt_ids) else
            np.zeros((0, llama_cfg.hidden_size), np.float32)
        )
        self.n_prompt_tokens = len(self._prompt_embeds)

        # Params are jit ARGUMENTS everywhere below: closed-over arrays get
        # baked into the HLO as constants — at 7B that is a multi-GB
        # program upload per compiled bucket (remote-compile tunnels reject
        # it outright) instead of device-resident buffers shared by all.
        if tp > 1:
            # Megatron TP over the mesh model axis for the generate graphs —
            # the dispatch_model parity for the feat4 stage (the reference
            # shards Vicuna for generate too, extract_wavlm_vicuna.py:
            # 306-312). GSPMD propagates the param shardings through the
            # whole while_loop decode, KV caches become head-sharded.
            from sdumc_tpu.parallel import make_mesh
            from sdumc_tpu.parallel.sharding import (
                llama_specs, shard_params, tp_sharding_summary)

            mesh = make_mesh(data_parallel=1, model_parallel=tp)
            specs = llama_specs(llama_params, mesh)
            self._llama_params = shard_params(llama_params, mesh, specs)
            print(tp_sharding_summary(self._llama_params, specs))
        else:
            self._llama_params = jax.device_put(llama_params)
        self._projector_params = jax.device_put(projector_params)

        # one projection program per padded length (frames zero-padded up to
        # the bucket; rows < T//k are unaffected by the padding, so slicing
        # [:T//k] reproduces the exact-length projection)
        @jax.jit
        def project(pp, feats):
            return projector.apply({"params": pp}, feats)

        self._project = lambda feats: project(self._projector_params, feats)
        self._proj_buckets = (160, 320, 640, 1280, 2560, 5120)
        self._generate: Dict = {}

        def make_gen():
            def gen(params, prompt_embeds, prompt_len):
                from sdumc_tpu.models.llama import LlamaForCausalLM

                def apply_fn(**kw):
                    return LlamaForCausalLM(llama_cfg).apply(
                        {"params": params}, **kw)

                def embed_fn(ids):
                    return params["model"]["embed_tokens"]["embedding"][ids]

                return beam_generate_batched(
                    apply_fn, prompt_embeds, llama_cfg, embed_fn=embed_fn,
                    prompt_len=prompt_len,
                    num_beams=num_beams, max_new_tokens=max_new_tokens,
                    eos_id=getattr(tokenizer, "eos_token_id", 2) or 2,
                    tap_layers=tap_layers,
                )
            jitted = jax.jit(gen)
            return lambda pe, pl: jitted(self._llama_params, pe, pl)

        self._make_gen = make_gen

    def prompt_len_for(self, n_frames: int) -> int:
        """Real prompt length for a [T, 1024] clip (projector rows + ASR
        prompt tokens) — computable from the npy header alone, so the
        directory driver can group clips by bucket without loading data."""
        return n_frames // self.proj_k + self.n_prompt_tokens

    def _padded_prompt(self, wavlm_feats: np.ndarray, bucket: int) -> np.ndarray:
        import jax.numpy as jnp

        T = len(wavlm_feats)
        tp = _bucket(T, self._proj_buckets)
        padded_in = np.zeros((tp, wavlm_feats.shape[1]), np.float32)
        padded_in[:T] = wavlm_feats
        proj = np.asarray(self._project(jnp.asarray(padded_in[None])))[0]
        full = np.concatenate([proj[: T // self.proj_k], self._prompt_embeds], 0)
        out = np.zeros((bucket, full.shape[1]), np.float32)
        out[bucket - len(full):] = full      # LEFT pad (masked out of keys)
        return out

    def extract_many(self, feats_list: List[np.ndarray]) -> List[dict]:
        """Batched extraction: clips grouped by prompt bucket, decoded
        ``gen_batch`` at a time in one lockstep program each; tail chunks
        are padded by repeating a row (discarded). Per-clip results are
        bit-identical to solo runs (test_generation.py)."""
        import jax.numpy as jnp

        results: List[Optional[dict]] = [None] * len(feats_list)
        by_bucket: Dict[int, List[int]] = {}
        for i, feats in enumerate(feats_list):
            n_real = self.prompt_len_for(len(feats))
            by_bucket.setdefault(_bucket(n_real, self.prompt_buckets), []).append(i)

        for bucket, rows in sorted(by_bucket.items()):
            C = self.gen_batch
            gen = self._generate.get((bucket, C))
            if gen is None:
                gen = self._make_gen()
                self._generate[(bucket, C)] = gen
            for ofs in range(0, len(rows), C):
                chunk = rows[ofs:ofs + C]
                prompts = np.zeros((C, bucket, self.cfg.hidden_size), np.float32)
                lens = np.zeros((C,), np.int32)
                for j in range(C):
                    i = chunk[min(j, len(chunk) - 1)]   # tail: repeat last
                    prompts[j] = self._padded_prompt(feats_list[i], bucket)
                    lens[j] = self.prompt_len_for(len(feats_list[i]))
                out = gen(jnp.asarray(prompts), jnp.asarray(lens))
                taps = np.asarray(out["taps"])
                tokens = np.asarray(out["tokens"])
                n_steps = np.asarray(out["n_steps"])
                n_tokens = np.asarray(out["n_tokens"])
                for j, i in enumerate(chunk):
                    n = int(n_steps[j])
                    results[i] = {
                        "taps": taps[j, :n],
                        "tokens": tokens[j],
                        "n_tokens": int(n_tokens[j]),
                    }
        return results  # type: ignore[return-value]

    def __call__(self, wavlm_feats: np.ndarray):
        """[T, 1024] -> dict(taps [n_steps, D], tokens, n_tokens)."""
        return self.extract_many([wavlm_feats])[0]


def extract_feat4_dir(extractor: Feat4Extractor, wavlm_dir: str, save_dir: str,
                      skip_existing: bool = True, too_long: Optional[set] = None):
    """Directory driver mirroring the reference's skip-and-continue
    resumability (extract_wavlm_vicuna.py:349), upgraded to group pending
    clips by prompt bucket (npy headers only) and decode ``gen_batch``
    clips per program."""
    os.makedirs(save_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(wavlm_dir, "*.npy")))
    t0 = time.time()

    pending = []
    for path in files:
        clip = os.path.basename(path)[:-4]
        if skip_existing and os.path.exists(os.path.join(save_dir, clip + ".npy")):
            continue
        if too_long and clip in too_long:
            continue
        n_frames = np.load(path, mmap_mode="r").shape[0]
        pending.append((clip, path, extractor.prompt_len_for(n_frames)))

    # bucket-major order maximizes chunk fullness per compiled program
    pending.sort(key=lambda x: (_bucket(x[2], extractor.prompt_buckets), x[0]))
    B = extractor.gen_batch
    done = 0
    for ofs in range(0, len(pending), B):
        group = pending[ofs:ofs + B]
        feats = [np.load(p).astype(np.float32) for _, p, _ in group]
        for (clip, _, _), result in zip(group, extractor.extract_many(feats)):
            np.save(os.path.join(save_dir, clip + ".npy"),
                    result["taps"].astype(np.float32))
            done += 1
    print(f"extracted {done}/{len(files)} clips in {time.time() - t0:.1f}s")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--llm_dir", type=str, required=True)
    parser.add_argument("--projector_path", type=str, required=True)
    parser.add_argument("--wavlm_dir", type=str, required=True)
    parser.add_argument("--save_dir", type=str, required=True)
    parser.add_argument("--num_beams", type=int, default=4)
    parser.add_argument("--max_new_tokens", type=int, default=200)
    parser.add_argument("--tap_layers", type=str, default="-4,-3,-2,-1")
    parser.add_argument("--gen_batch", type=int, default=4,
                        help="clips decoded per lockstep program (KV-cache "
                             "HBM is the ceiling: ~0.6 GB/clip at 7B bf16)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel degree over the mesh model "
                             "axis for the generate graphs")
    parser.add_argument("--scan_layers", action=argparse.BooleanOptionalAction,
                        default=True,
                        help="lax.scan over decoder layers (stacked params):"
                             " ~32x smaller decode HLO at 7B, numerics "
                             "identical (tests/test_llama_scan.py)")
    parser.add_argument("--quant", type=str, default=None,
                        choices=("int8", "w8a8"),
                        help="int8 = weight-only fast path (ops/quant.py): "
                             "decode streams half the bytes -> ~2x tokens/s "
                             "and 7B drops to ~7 GB; ~1%% numeric shift "
                             "(tests/test_quant.py). w8a8 additionally "
                             "quantizes activations per-row and runs native "
                             "int8xint8 MXU dots (no per-step dequant VPU "
                             "work; slightly larger numeric shift). "
                             "Mutually exclusive with --tp (TP specs "
                             "address bf16 kernels)")
    parser.add_argument("--kv_quant", type=str, default=None,
                        choices=("int8",),
                        help="int8 KV cache with per-(token, head) scales: "
                             "decode attention streams the whole cache every "
                             "step (2.95 GB at 7B beam-4 gen_batch=8), so "
                             "halving cache bytes attacks the next stream "
                             "after the weights. Composes with any --quant "
                             "mode; taps shift ~0.1-1% (test_quant.py)")
    args = parser.parse_args(argv)
    if args.quant and args.tp > 1:
        parser.error("--quant cannot be combined with --tp>1")

    import dataclasses

    import transformers

    from sdumc_tpu.convert.hf_llama import load_hf_llama, stack_scan_layers
    from sdumc_tpu.extract.projector import load_projector

    cfg, params = load_hf_llama(args.llm_dir)
    if args.scan_layers:
        cfg = dataclasses.replace(cfg, scan_layers=True)
        params = stack_scan_layers(params)
    if args.quant:
        from sdumc_tpu.ops.quant import quantize_params

        cfg = dataclasses.replace(cfg, quant=args.quant)
        params = quantize_params(params, mode=args.quant)
    if args.kv_quant:
        cfg = dataclasses.replace(cfg, kv_quant=args.kv_quant)
    tokenizer = transformers.AutoTokenizer.from_pretrained(args.llm_dir)
    projector_params = load_projector(args.projector_path)
    extractor = Feat4Extractor(
        None, params, cfg, projector_params, tokenizer,
        num_beams=args.num_beams, max_new_tokens=args.max_new_tokens,
        tap_layers=tuple(int(x) for x in args.tap_layers.split(",")),
        gen_batch=args.gen_batch, tp=args.tp,
    )
    extract_feat4_dir(extractor, args.wavlm_dir, args.save_dir)


if __name__ == "__main__":
    main()
