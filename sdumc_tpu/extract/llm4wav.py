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
handful of compiled programs cover the dataset.
"""

from __future__ import annotations

import argparse
import glob
import os
import time
from typing import Optional, Sequence

import numpy as np

DEFAULT_PROMPT = "Transcribe speech to text. "


def _bucket(n: int, buckets: Sequence[int]) -> int:
    return next((b for b in buckets if n <= b), n)


class Feat4Extractor:
    """WavLM features -> projector -> prompt concat -> beam generate -> taps."""

    def __init__(self, llama_model, llama_params, llama_cfg, projector_params,
                 tokenizer, *, num_beams: int = 4, max_new_tokens: int = 200,
                 tap_layers=(-4, -3, -2, -1), prompt: str = DEFAULT_PROMPT,
                 prompt_buckets: Sequence[int] = (64, 128, 256, 512)):
        import jax
        import jax.numpy as jnp

        from sdumc_tpu.extract.projector import EncoderProjectorConcat
        from sdumc_tpu.models.generation import beam_generate

        self.cfg = llama_cfg
        self.tokenizer = tokenizer
        self.prompt_buckets = prompt_buckets
        self.num_beams = num_beams
        self.max_new_tokens = max_new_tokens

        projector = EncoderProjectorConcat(llm_dim=llama_cfg.hidden_size)
        embedding = jnp.asarray(llama_params["model"]["embed_tokens"]["embedding"])

        def apply_fn(**kw):
            from sdumc_tpu.models.llama import LlamaForCausalLM

            return LlamaForCausalLM(llama_cfg).apply({"params": llama_params}, **kw)

        def embed_fn(ids):
            return embedding[ids]

        prompt_ids = tokenizer(prompt)["input_ids"] if tokenizer else []
        self._prompt_embeds = (
            np.asarray(embedding[jnp.asarray(prompt_ids)]) if len(prompt_ids) else
            np.zeros((0, llama_cfg.hidden_size), np.float32)
        )

        @jax.jit
        def project(feats):
            return projector.apply({"params": projector_params}, feats)

        self._project = project
        self._generate = {}

        def make_gen():
            def gen(prompt_embeds, prompt_len):
                return beam_generate(
                    apply_fn, prompt_embeds, llama_cfg, embed_fn=embed_fn,
                    num_beams=num_beams, max_new_tokens=max_new_tokens,
                    eos_id=getattr(tokenizer, "eos_token_id", 2) or 2,
                    tap_layers=tap_layers, prompt_len=prompt_len,
                )
            return jax.jit(gen)

        self._make_gen = make_gen

    def __call__(self, wavlm_feats: np.ndarray):
        """[T, 1024] -> dict(taps [n_steps, D], tokens, n_steps)."""
        import jax.numpy as jnp

        proj = np.asarray(self._project(jnp.asarray(wavlm_feats[None])))[0]
        full = np.concatenate([proj, self._prompt_embeds], axis=0)
        # Prompt-length bucketing: the embeds are LEFT-padded to the bucket
        # and beam_generate masks the pad slots out of every key set, so a
        # handful of compiled programs cover the dataset (real WavLM
        # projections give near-unique prompt lengths) and generation stays
        # identical to the exact-length program (test_generation.py).
        n_real = len(full)
        bucket = _bucket(n_real, self.prompt_buckets)
        padded = np.zeros((bucket, full.shape[1]), full.dtype)
        padded[bucket - n_real:] = full
        gen = self._generate.get(bucket)
        if gen is None:
            gen = self._make_gen()
            self._generate[bucket] = gen
        out = gen(jnp.asarray(padded[None]), jnp.int32(n_real))
        n = int(out["n_steps"])
        return {
            "taps": np.asarray(out["taps"])[:n],
            "tokens": np.asarray(out["tokens"]),
            "n_tokens": int(out["n_tokens"]),
        }


def extract_feat4_dir(extractor: Feat4Extractor, wavlm_dir: str, save_dir: str,
                      skip_existing: bool = True, too_long: Optional[set] = None):
    """Directory driver mirroring the reference's skip-and-continue
    resumability (extract_wavlm_vicuna.py:349)."""
    os.makedirs(save_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(wavlm_dir, "*.npy")))
    t0 = time.time()
    done = 0
    for path in files:
        clip = os.path.basename(path)[:-4]
        out_path = os.path.join(save_dir, clip + ".npy")
        if skip_existing and os.path.exists(out_path):
            continue
        if too_long and clip in too_long:
            continue
        feats = np.load(path).astype(np.float32)
        result = extractor(feats)
        np.save(out_path, result["taps"].astype(np.float32))
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
    args = parser.parse_args(argv)

    import transformers

    from sdumc_tpu.convert.hf_llama import load_hf_llama
    from sdumc_tpu.extract.projector import load_projector

    cfg, params = load_hf_llama(args.llm_dir)
    tokenizer = transformers.AutoTokenizer.from_pretrained(args.llm_dir)
    projector_params = load_projector(args.projector_path)
    extractor = Feat4Extractor(
        None, params, cfg, projector_params, tokenizer,
        num_beams=args.num_beams, max_new_tokens=args.max_new_tokens,
        tap_layers=tuple(int(x) for x in args.tap_layers.split(",")),
    )
    extract_feat4_dir(extractor, args.wavlm_dir, args.save_dir)


if __name__ == "__main__":
    main()
