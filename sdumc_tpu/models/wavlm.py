"""WavLM audio encoder (wavlm-large) — the audio feature extractor.

The reference runs HF ``WavLMModel`` per wav file and saves the -5 layer
hidden state, shape [T, 1024]
(feature_extraction/audio/extract_transformers_embedding.py:29-111,125).
This is a from-scratch JAX implementation of the same architecture
(stable-layer-norm variant used by wavlm-large):

  raw wav [B, S] -> 7 temporal convs (layer-norm + gelu) -> [B, T, 512]
  -> feature projection (LN + Linear to 1024)
  -> grouped positional conv embedding (kernel 128, 16 groups, weight-norm)
  -> 24 pre-LN transformer layers with WavLM's T5-style bucketed relative
     position bias, shared across layers, gated per layer ("gru_rel_pos")
  -> final LayerNorm; hidden_states taps per layer.

Weight-normed conv weights are folded into effective weights at conversion
(extraction is frozen inference; convert/hf_wavlm.py). Everything is one
jit; batched extraction replaces the reference's one-wav-at-a-time loop.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"      # wavlm-large; "group" = base models
    do_stable_layer_norm: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32
    # False = plain MHA (wav2vec2 / HuBERT — same trunk, no gated relative
    # position bias; the reference's audio extractor supports all three
    # families, extract_transformers_embedding.py:36-57)
    use_rel_pos_bias: bool = True
    # "einsum" materializes [B,H,T,T] scores+bias; "flash" streams them
    # through the factored-bias Pallas kernel (O(T) HBM,
    # ops/pallas/flash_wavlm.py); "ring" = sequence-parallel ring attention
    # (parallel/ring_attention.py) — only valid inside shard_map with the
    # time axis sharded over ``ring_axis`` (driven by
    # parallel.wavlm_sp.wavlm_forward_sp).
    #
    # "auto" picks einsum for short clips and flash for long ones.
    # Full-model measurements on v5e (scripts/bench_extractors.py) with
    # the head-packed kernel (blk 512/256): flash beats einsum at every
    # long regime — T=2999 B=1 bf16 15.4 vs 10.4 clips/s (1.49x), f32
    # 11.7 vs 7.3 (1.61x), B=8 bf16 19.6 vs 18.5 — while einsum still
    # wins the bulk regime (T~500, where attention is a small slice and
    # the kernel's tile padding hurts). The crossover knob is sequence
    # length, NOT score bytes: einsum's win shrinks as T grows and its
    # [B, H, T, T] scores eventually blow HBM outright (~4.6 GB at B=8
    # T=3000 bf16, ~18 GB at T=6000) — flash lifts that cap and is the
    # basis of the ring/SP path, which shards T across chips.
    attention_impl: str = "auto"
    # auto -> flash when T >= this many frames (~26 s of 16 kHz audio).
    # Placed by the mid-length sweep (scripts/bench_flash_crossover.py,
    # B=4 bf16 full model on v5e): T=1000 einsum 55.7 ms vs flash
    # 57.1 ms; T=1500 flash 92.8 vs 97.2; T=2000 flash 138.4 vs 146.7 —
    # crossover lands in (1000, 1500), default is the block-aligned
    # midpoint ...
    flash_min_frames: int = 1280
    # ... or when scores+probs would exceed this many bytes (hard memory
    # trigger, independent of the speed crossover)
    flash_score_budget: int = 8 << 30
    # 0 = auto: 512 for 2-byte dtypes, 256 for f32. bf16 512 is the
    # in-model measured optimum (scripts/bench_flash_inmodel.py: 356 ms
    # per long8 call vs 380 ms at block=256 — kernel-only sweeps prefer
    # 256 only through per-call tile-table rebuild that the encoder
    # amortizes). Bigger blocks amortize per-step overhead and bias-tile
    # DMA; the tile table grows O(T*blk*H) and stays <100 MB.
    flash_block: int = 0
    # heads packed per flash grid step (0 = all H; rounded down to a
    # divisor of H). In-model measured optimum for wavlm-large long clips
    # (scripts/bench_flash_inmodel.py, B=8 T=2999 bf16 v5e): hb=8 at
    # block=512 = 356 ms/call vs 380 ms for all-16 at block=256 — the
    # kernel-only sweep (bench_flash_tune.py) prefers block=256 only
    # because it rebuilds the bias-tile table per call, which the encoder
    # amortizes over its 24 layers.
    flash_head_block: int = 8
    # softmax in the base-2 domain: log2(e) folds into the (host-built)
    # bias tiles + q scale, removing the transcendental's internal
    # multiply from the per-score hot path. Algebraically identical —
    # and measured consistently SLOWER on v5e (every bench_flash_tune row:
    # exp2 4-10% behind exp at matched block/hb; Mosaic's exp lowering
    # evidently already folds the base conversion), so default off.
    flash_exp_base2: bool = False
    ring_axis: str = "data"

    @staticmethod
    def tiny(**kw) -> "WavLMConfig":
        base = dict(hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, conv_dim=(16, 16, 16),
                    conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
                    num_conv_pos_embeddings=16,
                    num_conv_pos_embedding_groups=4,
                    num_buckets=40, max_bucket_distance=100)
        base.update(kw)
        return WavLMConfig(**base)

    def resolved_flash_block(self) -> int:
        """flash_block=0 resolves to the measured per-dtype optimum."""
        if self.flash_block:
            return self.flash_block
        return 512 if jnp.dtype(self.dtype).itemsize == 2 else 256

    def output_length(self, n_samples: int) -> int:
        t = n_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            t = (t - k) // s + 1
        return t


def _conv1d(x, kernel, bias=None, stride=1, padding=0, groups=1):
    """x: [B, T, Cin]; kernel: [k, Cin/groups, Cout] (flax layout)."""
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias
    return out


class FeatureEncoder(nn.Module):
    """Temporal conv stack: raw wav -> frame features (HF WavLMFeatureEncoder)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = wav[:, :, None]  # [B, S, 1]
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            in_dim = x.shape[-1]
            kernel = self.param(f"conv_{i}_kernel", nn.initializers.he_normal(),
                                (k, in_dim, dim))
            bias = (
                self.param(f"conv_{i}_bias", nn.initializers.zeros, (dim,))
                if cfg.conv_bias else None
            )
            x = _conv1d(x, kernel, bias, stride=s)
            if cfg.feat_extract_norm == "layer":
                x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"ln_{i}")(x)
            elif i == 0:  # "group": GroupNorm(groups=channels) on first conv
                x = nn.GroupNorm(num_groups=dim, epsilon=1e-5, name="gn_0")(x)
            x = nn.gelu(x, approximate=False)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding (HF WavLMPositionalConvEmbedding);
    weight norm is folded into the stored kernel at conversion."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        d = cfg.hidden_size
        k = cfg.num_conv_pos_embeddings
        g = cfg.num_conv_pos_embedding_groups
        kernel = self.param("kernel", nn.initializers.he_normal(), (k, d // g, d))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        out = _conv1d(x, kernel, bias, stride=1, padding=k // 2, groups=g)
        if k % 2 == 0:  # SamePad trim
            out = out[:, :-1]
        return nn.gelu(out, approximate=False)


def relative_position_buckets(q_len: int, k_len: int, num_buckets: int,
                              max_distance: int) -> jnp.ndarray:
    """T5-style bidirectional bucketing (HF WavLMAttention.compute_bias)."""
    context = jnp.arange(q_len)[:, None]
    memory = jnp.arange(k_len)[None, :]
    rel = memory - context
    nb = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * nb
    rel = jnp.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    rel_large = (
        max_exact
        + jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(jnp.int32)
    rel_large = jnp.minimum(rel_large, nb - 1)
    return buckets + jnp.where(is_small, rel, rel_large)


class WavLMAttention(nn.Module):
    """Self-attention with shared bucketed relative position bias and the
    per-layer GRU-style gating (HF WavLMAttention)."""

    cfg: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(self, x, position_bias=None, pad_mask=None):
        cfg = self.cfg
        B, T, D = x.shape
        H = cfg.num_heads
        hd = D // H

        if not cfg.use_rel_pos_bias:
            # wav2vec2/HuBERT attention: no bias, no gating
            q = nn.Dense(D, name="q_proj")(x).reshape(B, T, H, hd)
            k = nn.Dense(D, name="k_proj")(x).reshape(B, T, H, hd)
            v = nn.Dense(D, name="v_proj")(x).reshape(B, T, H, hd)
            scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(hd)
            if pad_mask is not None:
                scores = jnp.where(pad_mask[:, None, None, :], scores, -1e30)
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
            out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
            return nn.Dense(D, name="out_proj")(out), None

        impl = cfg.attention_impl
        if impl == "auto":
            # flash for long clips (speed crossover, see config comment)
            # and whenever einsum's [B, H, T, T] scores+probs would
            # overflow the HBM budget; einsum otherwise
            score_bytes = 2 * B * H * T * T * jnp.dtype(cfg.dtype).itemsize
            impl = (
                "flash"
                if (T >= cfg.flash_min_frames
                    or score_bytes > cfg.flash_score_budget)
                and jax.default_backend() == "tpu"
                else "einsum"
            )

        if self.has_relative_position_bias:
            rel_embed = jnp.asarray(self.param(
                "rel_attn_embed", nn.initializers.normal(0.02),
                (cfg.num_buckets, H),
            ))
        else:
            rel_embed = None

        if impl == "einsum" and position_bias is None:
            assert rel_embed is not None
            buckets = relative_position_buckets(
                T, T, cfg.num_buckets, cfg.max_bucket_distance
            )
            # jnp.take (not fancy indexing): params may arrive as raw numpy
            # from the converter, which can't be indexed by traced arrays.
            position_bias = jnp.transpose(
                jnp.take(rel_embed, buckets, axis=0), (2, 0, 1)
            )  # [H, T, T]
        elif impl == "flash" and position_bias is None:
            # flash carries (rel_embed, Toeplitz bias tiles) across layers:
            # the tile table depends only on the shared [num_buckets, H]
            # embedding, so it is built ONCE here instead of once per layer
            # (at T=3000 that is ~50 MB of tile writes + the bucket-log
            # construction x24 saved); the [H, T, T] tensor is never built
            from sdumc_tpu.ops.pallas.flash_wavlm import bias_tile_table

            blk = cfg.resolved_flash_block()
            n_tiles = -(-T // blk)
            # kernel-ready form (dtype + base-2 fold) is baked here ONCE;
            # a per-layer cast of the ~90 MB table would re-stream it 24x.
            # bias_tile_table tags the fold state so flash_gated_attention
            # asserts it against the call's kwargs (ADVICE r4)
            position_bias = (rel_embed, bias_tile_table(
                rel_embed, n_tiles, blk,
                cfg.num_buckets, cfg.max_bucket_distance,
                dtype=jnp.bfloat16 if jnp.dtype(cfg.dtype).itemsize == 2
                else jnp.float32,
                exp_base2=cfg.flash_exp_base2))

        # --- gru_rel_pos gating of the shared bias
        gru_const = self.param("gru_rel_pos_const", nn.initializers.ones, (1, H, 1, 1))
        gate_dense = nn.Dense(8, name="gru_rel_pos_linear")
        gated = jnp.transpose(x.reshape(B, T, H, hd), (0, 2, 1, 3))  # [B,H,T,hd]
        proj = gate_dense(gated).reshape(B, H, T, 2, 4).sum(-1)       # [B,H,T,2]
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)  # [B,H,T,1]
        gate_out = gate_a * (gate_b * gru_const - 1.0) + 2.0          # [B,H,T,1]

        q = nn.Dense(D, name="q_proj")(x).reshape(B, T, H, hd)
        k = nn.Dense(D, name="k_proj")(x).reshape(B, T, H, hd)
        v = nn.Dense(D, name="v_proj")(x).reshape(B, T, H, hd)

        if impl == "ring":
            # sequence-parallel: we are INSIDE shard_map, x is the local
            # time shard; K/V ride the ring (parallel/ring_attention.py).
            # position_bias carries the [num_buckets, H] embedding across
            # layers exactly like the flash path.
            from sdumc_tpu.parallel.ring_attention import ring_gated_attention

            if position_bias is None:
                position_bias = rel_embed
            kvalid = (jnp.ones((B, T), jnp.float32) if pad_mask is None
                      else pad_mask.astype(jnp.float32))
            out = ring_gated_attention(
                q, k, v, gate_out[..., 0], kvalid, position_bias,
                axis_name=cfg.ring_axis,
                num_buckets=cfg.num_buckets,
                max_distance=cfg.max_bucket_distance,
            ).reshape(B, T, D)
            return nn.Dense(D, name="out_proj")(out), position_bias

        if impl == "flash":
            # trainable wrapper: identical kernel forward; a chunked-scan
            # custom_vjp supplies exact O(T)-memory gradients if the encoder
            # is ever fine-tuned (extraction itself stays frozen inference)
            from sdumc_tpu.ops.pallas.flash_wavlm import (
                flash_gated_attention_trainable as flash_gated_attention)

            rel_carry, tiles_carry = position_bias
            out = flash_gated_attention(
                q, k, v,
                gate_out[..., 0],                       # [B, H, T]
                rel_carry,
                pad_mask,
                tiles_carry,                            # shared across layers
                num_buckets=cfg.num_buckets,
                max_distance=cfg.max_bucket_distance,
                block=cfg.resolved_flash_block(),
                head_block=cfg.flash_head_block or None,
                exp_base2=cfg.flash_exp_base2,
                interpret=jax.default_backend() != "tpu",
            ).reshape(B, T, D)
            return nn.Dense(D, name="out_proj")(out), position_bias

        gated_bias = gate_out * position_bias[None]                    # [B,H,T,T]
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(hd)
        scores = scores + gated_bias
        if pad_mask is not None:  # [B, S] True = attend
            scores = jnp.where(pad_mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(out), position_bias


class EncoderLayer(nn.Module):
    """Encoder layer; pre-LN ("stable layer norm", wavlm-large) or post-LN
    (base models / wav2vec2-style) ordering per config."""

    cfg: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(self, x, position_bias=None, pad_mask=None):
        cfg = self.cfg
        ln1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")
        ln2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")
        attn = WavLMAttention(cfg, self.has_relative_position_bias, name="attention")

        def ff(h):
            h = nn.Dense(cfg.intermediate_size, name="intermediate_dense")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(cfg.hidden_size, name="output_dense")(h)

        if cfg.do_stable_layer_norm:  # pre-LN
            h, position_bias = attn(ln1(x), position_bias, pad_mask)
            x = x + h
            x = x + ff(ln2(x))
        else:  # post-LN
            h, position_bias = attn(x, position_bias, pad_mask)
            x = ln1(x + h)
            x = ln2(x + ff(x))
        return x, position_bias


class WavLMModel(nn.Module):
    """setup-style so the conv prologue and the transformer stack are also
    callable separately (``method="prologue"`` / ``method="encoder_stack"``)
    — the split the sequence-parallel driver needs (parallel/wavlm_sp.py:
    prologue replicated, stack shard_mapped over the time axis). Attribute
    names reproduce the original compact-scope param tree exactly."""

    cfg: WavLMConfig

    def setup(self):
        cfg = self.cfg
        self.feature_extractor = FeatureEncoder(cfg)
        self.feature_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps)
        self.feature_projection = nn.Dense(cfg.hidden_size)
        self.pos_conv_embed = PositionalConvEmbedding(cfg)
        self.encoder_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps)
        self.layers = [
            EncoderLayer(cfg, has_relative_position_bias=(i == 0))
            for i in range(cfg.num_layers)
        ]

    def prologue(self, wav: jnp.ndarray,
                 pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Everything before the transformer stack: conv feature encoder,
        projection, masking, positional conv (+ encoder LN for post-LN
        variants). Time is still whole here — the pos conv (kernel 128)
        must see unsharded frames."""
        cfg = self.cfg
        feats = self.feature_extractor(wav)
        x = self.feature_projection(self.feature_ln(feats))
        # pad_mask is FRAME-level [B, T] (True = real frame); callers compute
        # frame counts from sample counts via cfg.output_length. (The
        # reference pads nothing — it runs one wav at a time; the mask
        # enables batched extraction, HF-equivalent "padded frames output 0
        # and are not attended to".)
        if pad_mask is not None:
            x = jnp.where(pad_mask[:, :, None], x, 0.0)
        x = x + self.pos_conv_embed(x)
        if not cfg.do_stable_layer_norm:
            x = self.encoder_ln(x)
        return x

    def encoder_stack(self, x: jnp.ndarray,
                      frame_mask: Optional[jnp.ndarray] = None,
                      output_hidden_states: bool = False):
        """The transformer layers (+ final LN for pre-LN variants). Under
        the SP driver this runs inside shard_map on the local time shard
        with attention_impl='ring'."""
        cfg = self.cfg
        hidden_states = [x] if output_hidden_states else None
        position_bias = None
        for layer in self.layers:
            x, position_bias = layer(x, position_bias, frame_mask)
            if output_hidden_states:
                hidden_states.append(x)
        if cfg.do_stable_layer_norm:
            x = self.encoder_ln(x)
            if output_hidden_states:
                hidden_states[-1] = x
        return x, (tuple(hidden_states) if output_hidden_states else None)

    def __call__(
        self,
        wav: jnp.ndarray,
        *,
        pad_mask: Optional[jnp.ndarray] = None,
        output_hidden_states: bool = False,
    ):
        """wav: [B, S] float waveform (zero-mean/unit-var normalized by the
        host processor). Returns last_hidden_state [B, T, D] and optional
        hidden_states tuple (len = num_layers + 1, HF convention: entry 0 is
        the post-pos-conv input, the last entry is post-final-LN)."""
        x = self.prologue(wav, pad_mask)
        x, hidden_states = self.encoder_stack(
            x, pad_mask, output_hidden_states)
        return {
            "last_hidden_state": x,
            "hidden_states": hidden_states,
        }
