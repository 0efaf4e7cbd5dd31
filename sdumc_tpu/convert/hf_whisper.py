"""HF WhisperModel / WhisperForConditionalGeneration -> models/whisper.py.

The reference's ASR text-variant recipes consume Whisper transcripts
(shell/main_text_missing_icassp_inference.sh:6-9, config.py:50-57) but the
reference ships no ASR code; this converter + models/whisper.py +
extract/asr.py supply the producing side. Weight layout mirrors HF, so the
mapping is rename + transpose: torch Linear [out, in] -> flax Dense kernel
[in, out]; torch Conv1d [out, in, k] -> flax Conv kernel [k, in, out].
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from sdumc_tpu.models.whisper import WhisperConfig  # noqa: F401  (re-export)


def _a(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v,
                      np.float32)


def _dense(sd, pre, bias=True):
    d = {"kernel": _a(sd[pre + ".weight"]).T}
    if bias and pre + ".bias" in sd:
        d["bias"] = _a(sd[pre + ".bias"])
    return d


def _ln(sd, pre):
    return {"scale": _a(sd[pre + ".weight"]), "bias": _a(sd[pre + ".bias"])}


def _attn(sd, pre):
    return {
        "q_proj": _dense(sd, pre + ".q_proj"),
        "k_proj": _dense(sd, pre + ".k_proj", bias=False),
        "v_proj": _dense(sd, pre + ".v_proj"),
        "out_proj": _dense(sd, pre + ".out_proj"),
    }


def hf_whisper_to_params(state_dict: Dict) -> dict:
    """torch state dict (``model.``-prefix of WhisperForConditionalGeneration
    accepted and stripped; ``proj_out`` ignored — logits use the tied
    embedding) -> flax param tree for WhisperModel."""
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[len("model."):]
        if k.startswith("proj_out."):
            continue  # tied to decoder.embed_tokens
        sd[k] = v

    enc: dict = {
        "conv1": {"kernel": _a(sd["encoder.conv1.weight"]).transpose(2, 1, 0),
                  "bias": _a(sd["encoder.conv1.bias"])},
        "conv2": {"kernel": _a(sd["encoder.conv2.weight"]).transpose(2, 1, 0),
                  "bias": _a(sd["encoder.conv2.bias"])},
        "embed_positions": _a(sd["encoder.embed_positions.weight"]),
        "layer_norm": _ln(sd, "encoder.layer_norm"),
    }
    n_enc = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("encoder.layers."))
    for i in range(n_enc):
        pre = f"encoder.layers.{i}"
        enc[f"layers_{i}_self_attn"] = _attn(sd, pre + ".self_attn")
        enc[f"layers_{i}_self_attn_layer_norm"] = _ln(
            sd, pre + ".self_attn_layer_norm")
        enc[f"layers_{i}_fc1"] = _dense(sd, pre + ".fc1")
        enc[f"layers_{i}_fc2"] = _dense(sd, pre + ".fc2")
        enc[f"layers_{i}_final_layer_norm"] = _ln(sd, pre + ".final_layer_norm")

    dec: dict = {
        "embed_tokens": _a(sd["decoder.embed_tokens.weight"]),
        "embed_positions": _a(sd["decoder.embed_positions.weight"]),
        "layer_norm": _ln(sd, "decoder.layer_norm"),
    }
    n_dec = 1 + max(int(k.split(".")[2]) for k in sd
                    if k.startswith("decoder.layers."))
    for i in range(n_dec):
        pre = f"decoder.layers.{i}"
        dec[f"layers_{i}_self_attn"] = _attn(sd, pre + ".self_attn")
        dec[f"layers_{i}_self_attn_layer_norm"] = _ln(
            sd, pre + ".self_attn_layer_norm")
        dec[f"layers_{i}_encoder_attn"] = _attn(sd, pre + ".encoder_attn")
        dec[f"layers_{i}_encoder_attn_layer_norm"] = _ln(
            sd, pre + ".encoder_attn_layer_norm")
        dec[f"layers_{i}_fc1"] = _dense(sd, pre + ".fc1")
        dec[f"layers_{i}_fc2"] = _dense(sd, pre + ".fc2")
        dec[f"layers_{i}_final_layer_norm"] = _ln(sd, pre + ".final_layer_norm")

    return {"encoder": enc, "decoder": dec}


def load_hf_whisper(model_dir: str):
    """Local HF Whisper checkpoint dir -> (WhisperConfig, params,
    generation metadata dict). Zero-egress: from_pretrained on a local
    path only."""
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig.from_pretrained(model_dir)
    with torch.no_grad():
        hf = WhisperForConditionalGeneration.from_pretrained(
            model_dir, torch_dtype=torch.float32)
    cfg = WhisperConfig.from_hf(hf_cfg)
    params = hf_whisper_to_params(hf.state_dict())
    gen = getattr(hf, "generation_config", None)
    meta = {
        "decoder_start_token_id": hf_cfg.decoder_start_token_id,
        "eos_token_id": hf_cfg.eos_token_id,
        "forced_decoder_ids": list(getattr(gen, "forced_decoder_ids", None)
                                   or hf_cfg.forced_decoder_ids or []),
        "suppress_tokens": list(getattr(gen, "suppress_tokens", None)
                                or hf_cfg.suppress_tokens or []),
        "begin_suppress_tokens": list(
            getattr(gen, "begin_suppress_tokens", None)
            or hf_cfg.begin_suppress_tokens or []),
    }
    return cfg, params, meta
