"""Autoregressive decoding on TPU: greedy and beam search with hidden taps.

The reference's feat4 extractor is "an inference engine in miniature": HF
``generate`` with num_beams=4, do_sample=False, max_new_tokens=200,
harvesting the last-4-layer hidden states of the leading beam at every step
(extract_wavlm_vicuna.py:245-264). Rebuilt here as a single
``lax.while_loop`` over a static-shape KV cache — one XLA program per
(prompt-bucket, max_new_tokens), no per-step python.

Beam semantics follow HF's BeamSearchScorer (early_stopping=False,
length_penalty configurable): 2*num_beams candidates per step, EOS
candidates ranked < num_beams enter a fixed-size hypothesis pool, running
beams continue with non-EOS tokens, termination when the pool is full and
the best attainable running score cannot beat the worst hypothesis.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from sdumc_tpu.models.llama import LlamaConfig, cache_mask, init_cache

NEG = -1e9


class BeamState(NamedTuple):
    step: jnp.ndarray            # i32 — tokens generated so far
    last_tokens: jnp.ndarray     # [B] next forward input
    beam_scores: jnp.ndarray     # [B] running sum-logprobs
    tokens: jnp.ndarray          # [B, max_new] generated tokens per beam
    caches: Tuple                # per-layer KV caches
    taps: jnp.ndarray            # [max_new, D] hidden taps of leading beam
    hyp_scores: jnp.ndarray      # [B] finished-hypothesis scores (len-penalized)
    hyp_tokens: jnp.ndarray      # [B, max_new]
    hyp_lens: jnp.ndarray        # [B]
    done: jnp.ndarray            # bool


def _broadcast_caches(caches, B):
    """Replicate single-stream prefill caches across the beam axis (all
    beams share the prompt, so prefilling once and broadcasting is
    compute- and memory-cheaper than prefilling B identical streams and
    gathering)."""
    if isinstance(caches, dict):  # stacked scan-layers layout [L, 1, ...]
        rep = lambda c, ax: jnp.repeat(c, B, axis=ax)  # noqa: E731
        return {"k": rep(caches["k"], 1), "v": rep(caches["v"], 1),
                "index": caches["index"]}
    return tuple(
        {"k": jnp.repeat(c["k"], B, axis=0), "v": jnp.repeat(c["v"], B, axis=0),
         "index": c["index"]}
        for c in caches
    )


def _gather_caches(caches, beam_idx):
    if isinstance(caches, dict):
        # stacked scan-layers layout: [num_layers, beams, ...]
        return {"k": caches["k"][:, beam_idx], "v": caches["v"][:, beam_idx],
                "index": caches["index"]}
    return tuple(
        {"k": c["k"][beam_idx], "v": c["v"][beam_idx], "index": c["index"]}
        for c in caches
    )


def _slot_mask(cur_slots: jnp.ndarray, max_len: int, offset) -> jnp.ndarray:
    """Additive mask [B, 1, T, max_len]: attend cache slots in
    [offset, cur_slot]. ``offset`` is the number of left-pad slots (traced
    scalar — 0 for exact-length prompts), which lets one compiled program
    serve a whole prompt-length bucket."""
    slots = jnp.arange(max_len)[None, None, None, :]
    ok = jnp.logical_and(
        slots <= cur_slots[:, None, :, None], slots >= offset
    )
    return jnp.where(ok, 0.0, -1e30)


def beam_generate(
    apply_fn: Callable,
    prompt_embeds: jnp.ndarray,
    cfg: LlamaConfig,
    *,
    embed_fn: Callable,
    num_beams: int = 4,
    max_new_tokens: int = 200,
    eos_id: int = 2,
    length_penalty: float = 1.0,
    tap_layers: Sequence[int] = (-4, -3, -2, -1),
    prompt_len=None,
):
    """Beam-search decode from a prompt given as embeddings.

    Args:
      apply_fn: bound model fn(inputs_embeds, positions, attn_mask, caches,
        output_hidden_states) -> dict with logits/hidden_states/caches.
      prompt_embeds: [1, P, D]. With ``prompt_len``, P is a bucket size and
        the embeds are LEFT-padded: the last ``prompt_len`` slots are real.
        Left padding keeps the final slot = last real token (so the prefill
        logit tap stays [:, -1]) and the pad slots are masked out of every
        key set — generation is bit-equal to the exact-length program
        (tested), while one compiled program serves the whole bucket
        (reference recompiles nothing because it runs eager per clip;
        extract_wavlm_vicuna.py:245-258).
      prompt_len: optional traced i32 — number of real prompt positions.
      embed_fn: token ids [B, 1] -> embeddings [B, 1, D].

    Returns dict with:
      tokens [max_new]: best hypothesis token ids (EOS-padded),
      n_tokens: its length,
      taps [max_new, D]: per-step sum of tap_layers hidden states of the
        leading beam (the reference's feat4 stream, one row per generated
        token; rows >= n_steps are zero),
      n_steps: number of decode forwards taken.
    """
    B = num_beams
    P = prompt_embeds.shape[1]
    D = prompt_embeds.shape[2]
    max_len = P + max_new_tokens
    lp = length_penalty
    if prompt_len is None:
        prompt_len = jnp.int32(P)
    offset = P - prompt_len  # left-pad slots, 0 for exact-length prompts

    # ---- prefill (prompt hidden states are not tapped — reference [1:]).
    # One stream, not B: every beam shares the prompt, so the B-stream
    # prefill would compute and store B identical cache sets (at 7B the
    # extra copies are the difference between fitting one chip and not).
    caches = init_cache(cfg, 1, max_len)
    # RoPE positions: pad slots clamp to 0 (their K/V never enter a key set)
    pos = jnp.maximum(jnp.arange(P)[None] - offset, 0)
    slot = jnp.arange(P)[None]
    out = apply_fn(inputs_embeds=prompt_embeds[:1], positions=pos,
                   attn_mask=_slot_mask(slot, max_len, offset), caches=caches,
                   last_logit_only=True)
    caches = _broadcast_caches(out["caches"], B)
    logp = jax.nn.log_softmax(out["logits"][:, -1].astype(jnp.float32), axis=-1)

    # HF init: only beam 0 counts on the first selection ([1, V] logp
    # broadcasts over the beam axis)
    init_bias = jnp.where(jnp.arange(B) == 0, 0.0, NEG)
    scores0 = logp + init_bias[:, None]                     # [B, V]
    V = scores0.shape[-1]
    flat = scores0.reshape(-1)
    top_vals, top_idx = jax.lax.top_k(flat, B)              # first step: B non-eos slots
    # (HF would take 2B and filter EOS; at step 0 min_length=1 allows EOS,
    # but an EOS-only prompt continuation is degenerate — handled below by
    # the same candidate machinery from step 1 on. For step 0 we drop EOS
    # candidates into the pool too.)
    beam_idx0 = top_idx // V
    tokens0 = top_idx % V

    tokens = jnp.full((B, max_new_tokens), eos_id, jnp.int32)
    tokens = tokens.at[:, 0].set(tokens0)
    state = BeamState(
        step=jnp.int32(1),
        last_tokens=tokens0,
        beam_scores=top_vals,
        tokens=tokens,
        # no gather: every beam's prefill cache is identical by construction
        caches=caches,
        taps=jnp.zeros((max_new_tokens, D), jnp.float32),
        hyp_scores=jnp.full((B,), NEG, jnp.float32),
        hyp_tokens=jnp.full((B, max_new_tokens), eos_id, jnp.int32),
        hyp_lens=jnp.zeros((B,), jnp.int32),
        done=jnp.bool_(False),
    )

    def cond(s: BeamState):
        return jnp.logical_and(s.step < max_new_tokens, jnp.logical_not(s.done))

    def body(s: BeamState) -> BeamState:
        # ---- forward one token per beam (cache slot != RoPE position when
        # the prompt is left-padded to a bucket)
        positions = jnp.full((B, 1), 0, jnp.int32) + (prompt_len + s.step - 1)
        slot = jnp.full((B, 1), P + s.step - 1, jnp.int32)
        out = apply_fn(
            inputs_embeds=embed_fn(s.last_tokens[:, None]),
            positions=positions,
            attn_mask=_slot_mask(slot, max_len, offset),
            caches=s.caches,
            output_hidden_states=True,
        )
        hs = out["hidden_states"]
        # clamp like the reference's `inner_tuple[-4:]` slice on shallow models
        idxs = {i % len(hs) for i in tap_layers if -len(hs) <= i < len(hs)}
        tap = sum(hs[i][0, 0].astype(jnp.float32) for i in sorted(idxs))
        taps = jax.lax.dynamic_update_slice(s.taps, tap[None, :], (s.step - 1, 0))

        logp = jax.nn.log_softmax(out["logits"][:, -1].astype(jnp.float32), axis=-1)
        cand = s.beam_scores[:, None] + logp                 # [B, V]
        top_vals, top_idx = jax.lax.top_k(cand.reshape(-1), 2 * B)
        cand_beam = top_idx // V
        cand_tok = top_idx % V
        is_eos = cand_tok == eos_id

        # ---- EOS candidates ranked < B enter the hypothesis pool
        cur_len = s.step.astype(jnp.float32)  # generated length incl. this EOS? HF: cur_len tokens before eos
        hyp_cand_score = top_vals / (cur_len ** lp)
        rank = jnp.arange(2 * B)
        push = jnp.logical_and(is_eos, rank < B)

        hyp_scores, hyp_tokens, hyp_lens = s.hyp_scores, s.hyp_tokens, s.hyp_lens

        def push_one(i, carry):
            hs_, ht_, hl_ = carry
            worst = jnp.argmin(hs_)
            better = jnp.logical_and(push[i], hyp_cand_score[i] > hs_[worst])
            seq = s.tokens[cand_beam[i]]
            hs_ = jnp.where(better, hs_.at[worst].set(hyp_cand_score[i]), hs_)
            ht_ = jnp.where(better, ht_.at[worst].set(seq), ht_)
            hl_ = jnp.where(better, hl_.at[worst].set(s.step), hl_)
            return hs_, ht_, hl_

        hyp_scores, hyp_tokens, hyp_lens = jax.lax.fori_loop(
            0, 2 * B, push_one, (hyp_scores, hyp_tokens, hyp_lens)
        )

        # ---- first B non-EOS candidates continue as running beams
        live_rank = jnp.cumsum(jnp.logical_not(is_eos).astype(jnp.int32)) - 1
        # slot s gets the candidate i where live_rank[i] == s and not eos
        slot_of = jnp.where(jnp.logical_not(is_eos), live_rank, 2 * B)
        # build selection: for each slot 0..B-1 find its candidate index
        sel = jnp.argmax(slot_of[None, :] == jnp.arange(B)[:, None], axis=1)
        new_scores = top_vals[sel]
        new_beam_idx = cand_beam[sel]
        new_tok = cand_tok[sel]

        tokens = s.tokens[new_beam_idx]
        tokens = jax.lax.dynamic_update_slice(
            tokens, new_tok[:, None], (0, s.step)
        )
        caches = _gather_caches(out["caches"], new_beam_idx)

        # ---- HF is_done (early_stopping=False, lp>0):
        n_hyps = jnp.sum(hyp_scores > NEG / 2)
        best_attainable = jnp.max(new_scores) / ((cur_len + 1.0) ** lp)
        done = jnp.logical_and(n_hyps >= B, jnp.min(hyp_scores) >= best_attainable)

        return BeamState(
            step=s.step + 1,
            last_tokens=new_tok,
            beam_scores=new_scores,
            tokens=tokens,
            caches=caches,
            taps=taps,
            hyp_scores=hyp_scores,
            hyp_tokens=hyp_tokens,
            hyp_lens=hyp_lens,
            done=done,
        )

    final = jax.lax.while_loop(cond, body, state)

    # ---- finalize: fill the pool with running beams (HF finalize)
    run_score = final.beam_scores / (final.step.astype(jnp.float32) ** lp)

    def finalize_one(i, carry):
        hs_, ht_, hl_ = carry
        worst = jnp.argmin(hs_)
        better = run_score[i] > hs_[worst]
        hs_ = jnp.where(better, hs_.at[worst].set(run_score[i]), hs_)
        ht_ = jnp.where(better, ht_.at[worst].set(final.tokens[i]), ht_)
        hl_ = jnp.where(better, hl_.at[worst].set(final.step), hl_)
        return hs_, ht_, hl_

    hyp_scores, hyp_tokens, hyp_lens = jax.lax.fori_loop(
        0, B, finalize_one, (final.hyp_scores, final.hyp_tokens, final.hyp_lens)
    )
    best = jnp.argmax(hyp_scores)
    return {
        "tokens": hyp_tokens[best],
        "n_tokens": hyp_lens[best],
        "taps": final.taps,
        "n_steps": final.step,
        "score": hyp_scores[best],
    }


def greedy_generate(
    apply_fn: Callable,
    prompt_embeds: jnp.ndarray,
    cfg: LlamaConfig,
    *,
    embed_fn: Callable,
    max_new_tokens: int = 200,
    eos_id: int = 2,
    tap_layers: Sequence[int] = (-4, -3, -2, -1),
):
    """Greedy decode with the same tap semantics (beam_generate B=1 minus
    the hypothesis machinery)."""
    P, D = prompt_embeds.shape[1], prompt_embeds.shape[2]
    max_len = P + max_new_tokens
    caches = init_cache(cfg, 1, max_len)
    pos = jnp.arange(P)[None]
    out = apply_fn(inputs_embeds=prompt_embeds, positions=pos,
                   attn_mask=cache_mask(pos, max_len), caches=caches)
    caches = out["caches"]
    first = jnp.argmax(out["logits"][:, -1], axis=-1).astype(jnp.int32)  # [1]

    def cond(s):
        step, last, tokens, caches, taps, done = s
        return jnp.logical_and(step < max_new_tokens, jnp.logical_not(done))

    def body(s):
        step, last, tokens, caches, taps, done = s
        positions = jnp.full((1, 1), P + step - 1, jnp.int32)
        out = apply_fn(inputs_embeds=embed_fn(last[:, None]),
                       positions=positions,
                       attn_mask=cache_mask(positions, max_len),
                       caches=caches, output_hidden_states=True)
        hs = out["hidden_states"]
        # clamp like the reference's `inner_tuple[-4:]` slice on shallow models
        idxs = {i % len(hs) for i in tap_layers if -len(hs) <= i < len(hs)}
        tap = sum(hs[i][0, 0].astype(jnp.float32) for i in sorted(idxs))
        taps = jax.lax.dynamic_update_slice(taps, tap[None, :], (step - 1, 0))
        nxt = jnp.argmax(out["logits"][:, -1], axis=-1).astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step))
        return (step + 1, nxt, tokens, out["caches"], taps,
                jnp.logical_or(done, nxt[0] == eos_id))

    tokens = jnp.full((1, max_new_tokens), eos_id, jnp.int32).at[:, 0].set(first)
    state = (jnp.int32(1), first, tokens, caches,
             jnp.zeros((max_new_tokens, D), jnp.float32),
             first[0] == eos_id)
    step, _, tokens, _, taps, _ = jax.lax.while_loop(cond, body, state)
    return {"tokens": tokens[0], "n_steps": step, "taps": taps}


def beam_generate_batched(
    apply_fn: Callable,
    prompt_embeds: jnp.ndarray,
    cfg: LlamaConfig,
    *,
    embed_fn: Callable,
    prompt_len: jnp.ndarray,
    **kw,
):
    """Beam-search decode a BATCH of clips in one XLA program.

    Decode is weight-read-bound (every step streams the full parameter set
    from HBM regardless of batch), so running C clips in lockstep multiplies
    tokens/s by ~C until the MXU saturates — the reference's eager HF
    ``generate`` runs strictly one clip at a time
    (extract_wavlm_vicuna.py:245-258). Implemented as ``jax.vmap`` over the
    single-clip program: the while_loop batches to run-until-all-done with
    per-clip masking, so every clip's tokens/taps are bit-identical to its
    own solo run (tested); clips should share a prompt-length bucket so the
    lockstep tail waste stays small.

    Args:
      prompt_embeds: [C, P, D] (left-padded to the shared bucket P).
      prompt_len: [C] i32 real prompt lengths.
    Returns the beam_generate dict with a leading clip axis.
    """
    single = lambda pe, pl: beam_generate(
        apply_fn, pe, cfg, embed_fn=embed_fn, prompt_len=pl, **kw)
    return jax.vmap(single)(prompt_embeds[:, None], prompt_len)
