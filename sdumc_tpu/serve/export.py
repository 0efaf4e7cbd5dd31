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
