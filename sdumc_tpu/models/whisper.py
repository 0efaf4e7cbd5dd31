"""Whisper ASR (encoder-decoder) — produces the transcripts behind the
reference's ASR text-variant recipes.

The reference *consumes* Whisper-derived text features — its inference
shell sweeps ``-gt(base.en_vad)``-style feature names
(shell/main_text_missing_icassp_inference.sh:6-9) and config.py:50-57
carries whisper checkpoint path constants — but ships no ASR code: the
transcripts were produced by an external binary. This module closes that
gap TPU-natively: log-mel frontend (ops-level jnp.fft), conv-subsampled
encoder, KV-cached decoder, and a jitted ``greedy_transcribe`` while_loop
(HF logit semantics: forced decoder ids, suppress lists, EOS stop) so
``extract/asr.py`` can turn wav dirs into the transcription CSV the text
extractor consumes.

Parity: tiny-config encoder/decoder/generate vs HF ``WhisperModel`` /
``WhisperForConditionalGeneration`` (tests/test_whisper.py). Weight
layout mirrors HF so ``convert/hf_whisper.py`` is a rename+transpose.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 512               # base.en
    encoder_layers: int = 6
    encoder_heads: int = 8
    decoder_layers: int = 6
    decoder_heads: int = 8
    ffn_dim: int = 2048
    max_source_positions: int = 1500
    max_target_positions: int = 448
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.d_model // self.encoder_heads

    @staticmethod
    def tiny(**kw) -> "WhisperConfig":
        base = dict(vocab_size=100, num_mel_bins=8, d_model=16,
                    encoder_layers=2, encoder_heads=2, decoder_layers=2,
                    decoder_heads=2, ffn_dim=32, max_source_positions=50,
                    max_target_positions=40)
        base.update(kw)
        return WhisperConfig(**base)

    @staticmethod
    def from_hf(hf_cfg) -> "WhisperConfig":
        return WhisperConfig(
            vocab_size=hf_cfg.vocab_size,
            num_mel_bins=hf_cfg.num_mel_bins,
            d_model=hf_cfg.d_model,
            encoder_layers=hf_cfg.encoder_layers,
            encoder_heads=hf_cfg.encoder_attention_heads,
            decoder_layers=hf_cfg.decoder_layers,
            decoder_heads=hf_cfg.decoder_attention_heads,
            ffn_dim=hf_cfg.encoder_ffn_dim,
            max_source_positions=hf_cfg.max_source_positions,
            max_target_positions=hf_cfg.max_target_positions,
        )


class _Attention(nn.Module):
    """HF WhisperAttention: q/v/out have bias, k does not; q pre-scaled.
    setup-style so :meth:`kv` (cross-K/V precompute for cached decode) can
    share the projection params with :meth:`__call__`."""

    heads: int
    d_model: int
    cfg: WhisperConfig

    def setup(self):
        c = self.cfg
        self.q_proj = nn.Dense(self.d_model, dtype=c.dtype, name="q_proj")
        self.k_proj = nn.Dense(self.d_model, use_bias=False, dtype=c.dtype,
                               name="k_proj")
        self.v_proj = nn.Dense(self.d_model, dtype=c.dtype, name="v_proj")
        self.out_proj = nn.Dense(self.d_model, dtype=c.dtype, name="out_proj")

    def kv(self, src):
        """Project [B, S, D] -> ([B, S, H, hd], [B, S, H, hd]) once; decode
        reuses them every step (HF's cross-attention past_key_value)."""
        H = self.heads
        hd = self.d_model // H
        B = src.shape[0]
        return (self.k_proj(src).reshape(B, -1, H, hd),
                self.v_proj(src).reshape(B, -1, H, hd))

    def __call__(self, x, kv, mask=None, cache=None, xkv=None):
        """x: [B, T, D] queries. kv: [B, S, D] key/value source (self-attn
        passes x). cache: optional self-attn dict {k, v, index} with
        [B, S_max, H, hd]. xkv: optional precomputed cross (k, v) tuple —
        skips the k/v projections entirely."""
        c = self.cfg
        H = self.heads
        hd = self.d_model // H
        B, T, _ = x.shape
        q = (self.q_proj(x) * (hd ** -0.5)).reshape(B, T, H, hd)
        if xkv is not None:
            k, v = xkv
            new_cache = None
        else:
            k = self.k_proj(kv).reshape(B, -1, H, hd)
            v = self.v_proj(kv).reshape(B, -1, H, hd)
            if cache is not None:
                idx = cache["index"]
                k = jax.lax.dynamic_update_slice(
                    cache["k"], k.astype(cache["k"].dtype), (0, idx, 0, 0))
                v = jax.lax.dynamic_update_slice(
                    cache["v"], v.astype(cache["v"].dtype), (0, idx, 0, 0))
                new_cache = {"k": k, "v": v, "index": idx + T}
            else:
                new_cache = None
        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        if mask is not None:
            scores = scores + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, self.d_model)
        return self.out_proj(out), new_cache


class WhisperEncoder(nn.Module):
    """conv1 (s=1) -> GELU -> conv2 (s=2) -> GELU -> +sin pos table ->
    pre-LN transformer stack -> final LN (HF WhisperEncoder)."""

    cfg: WhisperConfig

    @nn.compact
    def __call__(self, mel):
        """mel: [B, n_mels, 2*max_source_positions] log-mel features
        (HF layout, frames on the last axis). Returns [B, S, D]."""
        c = self.cfg
        x = jnp.transpose(mel, (0, 2, 1)).astype(c.dtype)       # [B, T, M]
        x = nn.Conv(c.d_model, (3,), padding=[(1, 1)], dtype=c.dtype,
                    name="conv1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(c.d_model, (3,), strides=(2,), padding=[(1, 1)],
                    dtype=c.dtype, name="conv2")(x)
        x = nn.gelu(x, approximate=False)
        pos = self.param("embed_positions", sinusoids_init,
                         (c.max_source_positions, c.d_model))
        x = x + pos[None, : x.shape[1]].astype(c.dtype)
        for i in range(c.encoder_layers):
            h = nn.LayerNorm(epsilon=1e-5, name=f"layers_{i}_self_attn_layer_norm")(x)
            h, _ = _Attention(c.encoder_heads, c.d_model, c,
                              name=f"layers_{i}_self_attn")(h, h)
            x = x + h
            h = nn.LayerNorm(epsilon=1e-5, name=f"layers_{i}_final_layer_norm")(x)
            h = nn.Dense(c.ffn_dim, dtype=c.dtype, name=f"layers_{i}_fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(c.d_model, dtype=c.dtype, name=f"layers_{i}_fc2")(h)
            x = x + h
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x)


def sinusoids_init(key, shape, dtype=jnp.float32):
    """Whisper's fixed sinusoidal table (stored as a weight in HF ckpts;
    regenerated here so random init == converted init)."""
    length, channels = shape
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(np.concatenate([np.sin(t), np.cos(t)], axis=1), dtype)


class WhisperDecoder(nn.Module):
    """Token embed + learned positions, pre-LN layers of
    self-attn (causal, cached) -> cross-attn -> FFN, final LN.
    Logits via the tied embedding (HF proj_out). setup-style so
    :meth:`cross_kv` shares the cross-attention projections."""

    cfg: WhisperConfig

    def setup(self):
        c = self.cfg
        self.embed_tokens = self.param(
            "embed_tokens", nn.initializers.normal(0.02),
            (c.vocab_size, c.d_model))
        self.embed_positions = self.param(
            "embed_positions", nn.initializers.normal(0.02),
            (c.max_target_positions, c.d_model))
        self.self_attns = [
            _Attention(c.decoder_heads, c.d_model, c,
                       name=f"layers_{i}_self_attn")
            for i in range(c.decoder_layers)]
        self.cross_attns = [
            _Attention(c.decoder_heads, c.d_model, c,
                       name=f"layers_{i}_encoder_attn")
            for i in range(c.decoder_layers)]
        self.ln_self = [nn.LayerNorm(epsilon=1e-5, name=f"layers_{i}_self_attn_layer_norm")
                        for i in range(c.decoder_layers)]
        self.ln_cross = [
            nn.LayerNorm(epsilon=1e-5, name=f"layers_{i}_encoder_attn_layer_norm")
            for i in range(c.decoder_layers)]
        self.ln_ffn = [nn.LayerNorm(epsilon=1e-5, name=f"layers_{i}_final_layer_norm")
                       for i in range(c.decoder_layers)]
        self.fc1 = [nn.Dense(c.ffn_dim, dtype=c.dtype, name=f"layers_{i}_fc1")
                    for i in range(c.decoder_layers)]
        self.fc2 = [nn.Dense(c.d_model, dtype=c.dtype, name=f"layers_{i}_fc2")
                    for i in range(c.decoder_layers)]
        self.final_ln = nn.LayerNorm(epsilon=1e-5, name="layer_norm")

    def __call__(self, tokens, enc_out=None, positions=None, caches=None,
                 self_mask=None, xkvs=None):
        """tokens: [B, T] ids. enc_out: [B, S, D] (needed unless ``xkvs``
        precomputed cross K/V are given). caches: per-layer self-attn cache
        dicts or None. Returns dict(logits, caches, hidden)."""
        c = self.cfg
        B, T = tokens.shape
        x = jnp.take(self.embed_tokens, tokens, axis=0).astype(c.dtype)
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        x = x + jnp.take(self.embed_positions, positions, axis=0).astype(c.dtype)

        if self_mask is None:
            causal = jnp.tril(jnp.ones((T, T), bool))
            self_mask = jnp.where(causal, 0.0, -1e30)[None, None]

        new_caches = [] if caches is not None else None
        for i in range(c.decoder_layers):
            h = self.ln_self[i](x)
            h, nc = self.self_attns[i](
                h, h, mask=self_mask,
                cache=None if caches is None else caches[i])
            if new_caches is not None:
                new_caches.append(nc)
            x = x + h
            h = self.ln_cross[i](x)
            h, _ = self.cross_attns[i](
                h, enc_out if enc_out is not None else h,
                xkv=None if xkvs is None else xkvs[i])
            x = x + h
            h = self.ln_ffn[i](x)
            h = self.fc2[i](nn.gelu(self.fc1[i](h), approximate=False))
            x = x + h
        x = self.final_ln(x)
        logits = jnp.einsum("btd,vd->btv", x.astype(jnp.float32),
                            self.embed_tokens.astype(jnp.float32))
        return {"logits": logits,
                "caches": tuple(new_caches) if new_caches is not None else None,
                "hidden": x}

    def cross_kv(self, enc_out):
        """Precompute per-layer cross-attention K/V from encoder output
        (decode reuses them every step)."""
        return tuple(att.kv(enc_out) for att in self.cross_attns)


class WhisperModel(nn.Module):
    cfg: WhisperConfig

    def setup(self):
        self.encoder = WhisperEncoder(self.cfg)
        self.decoder = WhisperDecoder(self.cfg)

    def __call__(self, mel, tokens):
        enc = self.encoder(mel)
        return self.decoder(tokens, enc_out=enc)

    def encode(self, mel):
        return self.encoder(mel)

    def decode(self, tokens, enc_out=None, positions=None, caches=None,
               self_mask=None, xkvs=None):
        return self.decoder(tokens, enc_out=enc_out, positions=positions,
                            caches=caches, self_mask=self_mask, xkvs=xkvs)

    def decoder_cross_kv(self, enc_out):
        return self.decoder.cross_kv(enc_out)


def init_self_caches(cfg: WhisperConfig, batch: int, max_len: int):
    hd = cfg.d_model // cfg.decoder_heads
    return tuple(
        {"k": jnp.zeros((batch, max_len, cfg.decoder_heads, hd), cfg.dtype),
         "v": jnp.zeros((batch, max_len, cfg.decoder_heads, hd), cfg.dtype),
         "index": jnp.int32(0)}
        for _ in range(cfg.decoder_layers)
    )


def greedy_transcribe(
    apply_fn,
    mel: jnp.ndarray,
    cfg: WhisperConfig,
    *,
    start_id: int,
    eos_id: int,
    max_new_tokens: int = 200,
    forced_ids: Sequence[Tuple[int, int]] = (),
    suppress_ids: Sequence[int] = (),
    begin_suppress_ids: Sequence[int] = (),
):
    """Batched greedy ASR decode as ONE jitted while_loop.

    HF ``generate`` logit semantics for Whisper (greedy, no timestamps):
    ``forced_ids`` is the (position, token) list forced verbatim at the
    given sequence positions (position 1 = first generated token);
    ``suppress_ids`` are -inf at every step; ``begin_suppress_ids`` only at
    the first non-forced step. Decode stops per-clip at ``eos_id`` (done
    clips freeze their outputs and free-run, same pattern as
    models/generation.py).

    Args:
      apply_fn: bound WhisperModel.apply wrapper exposing methods
        ``encode``, ``decode``, ``decoder_cross_kv`` (see extract/asr.py).
      mel: [B, n_mels, frames] (clips padded to the 30 s window are fully
        attended, matching HF's recipe).
    Returns dict(tokens [B, max_new], n_tokens [B]).
    """
    B = mel.shape[0]
    enc = apply_fn("encode", mel)
    xkvs = apply_fn("decoder_cross_kv", enc)

    # forced/suppress tables as static arrays baked into the program
    forced = np.full((max_new_tokens,), -1, np.int32)
    for p, t in forced_ids:
        if 1 <= p <= max_new_tokens:
            forced[p - 1] = t
    n_forced_prefix = 0
    while (n_forced_prefix < max_new_tokens
           and forced[n_forced_prefix] >= 0):
        n_forced_prefix += 1
    forced = jnp.asarray(forced)
    sup = jnp.asarray(sorted(set(int(s) for s in suppress_ids)), jnp.int32)
    bsup = jnp.asarray(sorted(set(int(s) for s in begin_suppress_ids)),
                       jnp.int32)

    max_len = max_new_tokens + 1
    caches = init_self_caches(cfg, B, max_len)
    # slot mask for cached self-attention: attend slots <= current
    slot_mask = lambda s: jnp.where(  # noqa: E731
        jnp.arange(max_len)[None, None, None, :] <= s, 0.0, -1e30)

    def step_logits(tok, step, caches):
        out = apply_fn(
            "decode", tok[:, None], positions=jnp.full((B, 1), step, jnp.int32),
            caches=caches, self_mask=slot_mask(step), xkvs=xkvs)
        return out["logits"][:, -1], out["caches"]

    def select(logits, step):
        logits = jnp.where(
            jnp.isin(jnp.arange(cfg.vocab_size), sup)[None], -jnp.inf, logits
        ) if sup.size else logits
        begin = step == n_forced_prefix
        if bsup.size:
            mask = jnp.isin(jnp.arange(cfg.vocab_size), bsup)[None]
            logits = jnp.where(jnp.logical_and(begin, mask), -jnp.inf, logits)
        pick = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        f = forced[step]
        return jnp.where(f >= 0, f, pick)

    def cond(s):
        step, last, tokens, caches, done = s
        return jnp.logical_and(step < max_new_tokens,
                               jnp.logical_not(jnp.all(done)))

    def body(s):
        step, last, tokens_prev, caches, done = s
        logits, caches = step_logits(last, step, caches)
        nxt = select(logits, step)
        nxt = jnp.where(done, eos_id, nxt)
        tokens = jax.lax.dynamic_update_slice(
            tokens_prev, nxt[:, None], (0, step))
        tokens = jnp.where(done[:, None], tokens_prev, tokens)
        return (step + 1, nxt, tokens,
                caches, jnp.logical_or(done, nxt == eos_id))

    tokens0 = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
    start = jnp.full((B,), start_id, jnp.int32)
    state = (jnp.int32(0), start, tokens0, caches,
             jnp.zeros((B,), bool))
    _, _, tokens, _, _ = jax.lax.while_loop(cond, body, state)
    n_tokens = jnp.sum(tokens != eos_id, axis=1)
    return {"tokens": tokens, "n_tokens": n_tokens}
