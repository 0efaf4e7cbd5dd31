"""Serving export: the dual-view eval step as portable StableHLO artifacts.

The reference has no deployment story — serving means cloning the repo and
loading the ``.pt`` in eager PyTorch. Here the jitted dual-view inference
program (both views, bucketed static shapes, traced ``t_max`` — exactly
what `cli/infer.py` runs) is exported with ``jax.export`` into versioned
StableHLO artifacts: one per length-bucket combination, callable from any
process with jax installed — no model code, no flax, no checkpoint
conversion at serving time. Params travel inside the artifact call as plain
arrays, so the served program is a pure function of (params, batch).

    bundle = ServingBundle.build(model, params, input_dims, combos, B)
    bundle.save(dir)                      # manifest.json + *.stablehlo
    bundle = ServingBundle.load(dir)      # any later process
    v_full, v_missing = bundle(batch_np_dict)   # picks bucket, pads, runs
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np


def _batch_structs(input_dims: Sequence[int], B: int,
                   combo: Sequence[int]):
    import jax
    import jax.numpy as jnp

    da, dt, dv = input_dims[:3]
    df = input_dims[3] if len(input_dims) > 3 else dt
    ta, tt, tv, tf = combo
    f32 = jnp.float32
    return {
        "audio": jax.ShapeDtypeStruct((B, ta, da), f32),
        "text": jax.ShapeDtypeStruct((B, tt, dt), f32),
        "video": jax.ShapeDtypeStruct((B, tv, dv), f32),
        "feat4": jax.ShapeDtypeStruct((B, tf, df), f32),
        "vals": jax.ShapeDtypeStruct((B,), f32),
        "t_max": tuple(jax.ShapeDtypeStruct((), jnp.int32) for _ in range(4)),
    }


def export_dual_view_eval(model, params, input_dims: Sequence[int], B: int,
                          combo: Sequence[int],
                          platforms: Sequence[str] | None = None) -> bytes:
    """Serialize one (batch_size, bucket-combo) dual-view eval program.
    ``platforms`` defaults to the current backend; pass ("tpu", "cpu") for
    a cross-platform artifact."""
    import jax
    from jax import export as jax_export

    from sdumc_tpu.train.step import make_eval_step

    eval_step = make_eval_step(model)
    params_structs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), params)
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exp = jax_export.export(eval_step, **kw)(
        params_structs, _batch_structs(input_dims, B, combo))
    return exp.serialize()


def load_exported(blob: bytes):
    from jax import export as jax_export

    return jax_export.deserialize(blob)


class ServingBundle:
    """A directory of exported programs + params, dispatched by bucket."""

    def __init__(self, combos: List[Tuple[int, ...]], B: int,
                 input_dims: Sequence[int], programs: Dict[tuple, object],
                 params):
        self.combos = combos
        self.B = B
        self.input_dims = list(input_dims)
        self._programs = programs
        self._params = params

    @staticmethod
    def build(model, params, input_dims: Sequence[int],
              combos: Sequence[Sequence[int]], B: int,
              platforms: Sequence[str] | None = None) -> "ServingBundle":
        progs = {
            tuple(c): load_exported(export_dual_view_eval(
                model, params, input_dims, B, c, platforms))
            for c in combos
        }
        return ServingBundle([tuple(c) for c in combos], B, input_dims,
                             progs, params)

    # ---- persistence -----------------------------------------------------
    def save(self, out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        names = {}
        for c in self.combos:
            name = "eval_" + "x".join(map(str, c)) + ".stablehlo"
            exp = self._programs[c]
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize() if hasattr(exp, "serialize") else exp)
            names["x".join(map(str, c))] = name
        import jax

        # structural param-tree serialization: '/'-joined key paths in the
        # manifest, arrays in params.npz. No pickle — loading a bundle from
        # an untrusted producer must not execute code (param trees here are
        # nested dicts of arrays, which key paths capture losslessly).
        flat_kp, _ = jax.tree_util.tree_flatten_with_path(self._params)
        paths = ["/".join(str(getattr(k, "key", k)) for k in kp)
                 for kp, _ in flat_kp]
        np.savez(os.path.join(out_dir, "params.npz"),
                 **{f"p{i}": np.asarray(x) for i, (_, x) in enumerate(flat_kp)})
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump({"batch_size": self.B, "input_dims": self.input_dims,
                       "combos": [list(c) for c in self.combos],
                       "programs": names, "param_paths": paths}, f, indent=1)

    @staticmethod
    def load(out_dir: str) -> "ServingBundle":
        with open(os.path.join(out_dir, "manifest.json")) as f:
            man = json.load(f)
        progs = {}
        for c in man["combos"]:
            name = man["programs"]["x".join(map(str, c))]
            with open(os.path.join(out_dir, name), "rb") as f:
                progs[tuple(c)] = load_exported(f.read())
        blob = np.load(os.path.join(out_dir, "params.npz"))
        params: dict = {}
        for i, path in enumerate(man["param_paths"]):
            node = params
            keys = path.split("/")
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = blob[f"p{i}"]
        return ServingBundle([tuple(c) for c in man["combos"]],
                             man["batch_size"], man["input_dims"], progs, params)

    # ---- dispatch --------------------------------------------------------
    def _pick(self, lens: Tuple[int, ...]) -> Tuple[int, ...]:
        fitting = [c for c in self.combos if all(l <= b for l, b in zip(lens, c))]
        if not fitting:
            raise ValueError(f"no exported bucket combo fits lengths {lens}; "
                             f"have {self.combos}")
        # minimal total padded tokens, not lexicographic order: with
        # heterogeneous combos (e.g. (64,512,512,64) vs (256,64,64,64)) the
        # tuple-smallest combo can pad far more than necessary
        return min(fitting, key=lambda c: (sum(c), c))

    def __call__(self, batch: Dict[str, np.ndarray]):
        """batch: audio/text/video/feat4 [B', T_m, D_m] (B' <= batch_size)
        -> (vals_full [B'], vals_missing [B'])."""
        lens = tuple(batch[k].shape[1] for k in ("audio", "text", "video", "feat4"))
        combo = self._pick(lens)
        Bp = batch["audio"].shape[0]
        padded = {}
        for k, t_b in zip(("audio", "text", "video", "feat4"), combo):
            x = batch[k]
            out = np.zeros((self.B, t_b, x.shape[2]), np.float32)
            out[:Bp, : x.shape[1]] = x
            padded[k] = out
        padded["vals"] = np.zeros((self.B,), np.float32)
        padded["t_max"] = tuple(np.int32(l) for l in lens)
        exp = self._programs[combo]
        v0, v1 = exp.call(self._params, padded)
        return np.asarray(v0)[:Bp], np.asarray(v1)[:Bp]


# ---------------------------------------------------------------------------
# feat4 decode serving: the beam-search extractor as exported programs
# ---------------------------------------------------------------------------
#
# The reference's heaviest stage — Vicuna beam-4 generate per clip
# (extract_wavlm_vicuna.py:245-264) — deploys here the same way the fusion
# eval does: one jax.export StableHLO artifact per (prompt-bucket,
# gen_batch), the whole while_loop beam engine inside (split KV cache,
# exact top-k, per-step taps). A serving process needs jax + the artifact
# + params.npz — no flax, no model code, no HF.


def export_beam_decode(cfg, params, *, prompt_bucket: int, gen_batch: int,
                       num_beams: int = 4, max_new_tokens: int = 200,
                       eos_id: int = 2, length_penalty: float = 1.0,
                       platforms: Sequence[str] | None = None) -> bytes:
    """Serialize one (prompt_bucket, gen_batch) beam-decode program:
    (params, prompt_embeds [C, P, D] f32, prompt_len [C] i32) ->
    dict(tokens, n_tokens, taps, n_steps, score)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    from sdumc_tpu.models.generation import beam_generate_batched
    from sdumc_tpu.models.llama import LlamaForCausalLM

    model = LlamaForCausalLM(cfg)

    def gen_fn(p, pe, pl):
        apply_fn = lambda **kw: model.apply({"params": p}, **kw)  # noqa: E731
        embed_fn = lambda ids: p["model"]["embed_tokens"]["embedding"][ids]  # noqa: E731
        return beam_generate_batched(
            apply_fn, pe, cfg, embed_fn=embed_fn, prompt_len=pl,
            num_beams=num_beams, max_new_tokens=max_new_tokens,
            eos_id=eos_id, length_penalty=length_penalty)

    params_structs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        params)
    pe = jax.ShapeDtypeStruct((gen_batch, prompt_bucket, cfg.hidden_size),
                              jnp.float32)
    pl = jax.ShapeDtypeStruct((gen_batch,), jnp.int32)
    kw = {"platforms": tuple(platforms)} if platforms else {}
    return jax_export.export(jax.jit(gen_fn), **kw)(
        params_structs, pe, pl).serialize()


class DecodeBundle:
    """Exported beam-decode programs dispatched by prompt bucket.

    Mirrors ServingBundle's layout: ``manifest.json`` + one
    ``decode_p{bucket}_c{gen_batch}.stablehlo`` per bucket + params.npz.
    ``__call__`` left-pads prompts into the smallest fitting bucket, pads
    partial clip batches, and strips the padding from the results —
    exactly the production path of extract/llm4wav.py."""

    def __init__(self, buckets, gen_batch, hidden_size, max_new, programs,
                 params):
        self.buckets = list(buckets)
        self.gen_batch = gen_batch
        self.hidden_size = hidden_size
        self.max_new = max_new
        self._programs = programs
        self._params = params

    @staticmethod
    def build(cfg, params, *, buckets: Sequence[int], gen_batch: int,
              num_beams: int = 4, max_new_tokens: int = 200,
              eos_id: int = 2, platforms: Sequence[str] | None = None
              ) -> "DecodeBundle":
        progs = {
            int(b): load_exported(export_beam_decode(
                cfg, params, prompt_bucket=int(b), gen_batch=gen_batch,
                num_beams=num_beams, max_new_tokens=max_new_tokens,
                eos_id=eos_id, platforms=platforms))
            for b in buckets
        }
        return DecodeBundle(sorted(progs), gen_batch, cfg.hidden_size,
                            max_new_tokens, progs, params)

    def save(self, out_dir: str) -> None:
        import jax

        os.makedirs(out_dir, exist_ok=True)
        names = {}
        for b, exp in self._programs.items():
            name = f"decode_p{b}_c{self.gen_batch}.stablehlo"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(exp.serialize() if hasattr(exp, "serialize") else exp)
            names[str(b)] = name
        flat_kp, _ = jax.tree_util.tree_flatten_with_path(self._params)
        paths = ["/".join(str(getattr(k, "key", k)) for k in kp)
                 for kp, _ in flat_kp]
        np.savez(os.path.join(out_dir, "params.npz"),
                 **{f"p{i}": np.asarray(x) for i, (_, x) in enumerate(flat_kp)})
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump({"kind": "beam_decode", "buckets": self.buckets,
                       "gen_batch": self.gen_batch,
                       "hidden_size": self.hidden_size,
                       "max_new_tokens": self.max_new,
                       "programs": names, "param_paths": paths}, f, indent=1)

    @staticmethod
    def load(out_dir: str) -> "DecodeBundle":
        with open(os.path.join(out_dir, "manifest.json")) as f:
            man = json.load(f)
        assert man.get("kind") == "beam_decode", man.get("kind")
        progs = {}
        for b in man["buckets"]:
            with open(os.path.join(out_dir, man["programs"][str(b)]), "rb") as f:
                progs[int(b)] = load_exported(f.read())
        blob = np.load(os.path.join(out_dir, "params.npz"))
        params: dict = {}
        for i, path in enumerate(man["param_paths"]):
            node = params
            keys = path.split("/")
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = blob[f"p{i}"]
        return DecodeBundle(man["buckets"], man["gen_batch"],
                            man["hidden_size"], man["max_new_tokens"],
                            progs, params)

    def __call__(self, prompts: List[np.ndarray]):
        """prompts: list of [P_i, D] f32 embedding matrices (len <=
        gen_batch). Returns dict with leading axis len(prompts):
        tokens/n_tokens/taps/n_steps/score."""
        C = len(prompts)
        assert 0 < C <= self.gen_batch, (C, self.gen_batch)
        longest = max(p.shape[0] for p in prompts)
        fitting = [b for b in self.buckets if longest <= b]
        if not fitting:
            raise ValueError(
                f"no exported prompt bucket fits length {longest}; "
                f"have {self.buckets}")
        bucket = min(fitting)
        pe = np.zeros((self.gen_batch, bucket, self.hidden_size), np.float32)
        pl = np.ones((self.gen_batch,), np.int32)  # pad rows: 1 real slot
        for i, p in enumerate(prompts):
            pe[i, bucket - p.shape[0]:] = p        # LEFT-pad (engine contract)
            pl[i] = p.shape[0]
        out = self._programs[bucket].call(self._params, pe, pl)
        return {k: np.asarray(v)[:C] for k, v in out.items()}
