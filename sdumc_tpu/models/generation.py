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

The engine is NATIVELY BATCHED over clips (leading axis C): one while_loop
decodes C clips x B beams in lockstep, per-clip ``done`` freezing only the
SMALL state (tokens/taps/scores/pools). The first version vmapped a
single-clip while_loop instead — vmap rewrites the loop to "run while any
element's cond holds" and re-SELECTs every state leaf per step, including
the multi-GB KV caches (read old + read new + write = 3x cache bytes of
pure overhead per decode step at 7B). Here the caches free-run for done
clips (their outputs are frozen, so the garbage is never consumed).

The KV cache is SPLIT (models/llama.py _split_attention): a per-clip
prompt part [C, P] that every beam reads shared (never copied, never
reordered) and a per-beam generated part [C*B, max_new]. The beam-ancestry
reorder gathers ONLY the generated part, and beam-candidate selection runs
exact_topk (argmax sweeps) instead of sort-based lax.top_k — together
these removed ~2/3 of the per-step decode time measured in round 4
(profiles/decode_ops.md: top_k ~9 ms + full-cache reorder ~15 ms of a
~37 ms step at 7B gen_batch=8). Per-clip results are bit-identical to
solo runs (test_generation.py)."""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from sdumc_tpu.models.llama import (LlamaConfig, cache_mask, init_cache,
                                    split_cache_from_prefill)

NEG = -1e9


def exact_topk(x: jnp.ndarray, k: int):
    """Exact top-k over the last axis via k argmax sweeps.

    ``lax.top_k`` lowers to a sort-based partial sort on TPU — the decode
    profile (profiles/decode_ops.md) showed the two per-step top_k calls
    over [C, B*V≈131k] costing ~9 ms/step (pad_maximum + mini-gather ops)
    in a ~37 ms step. For small k (2*num_beams = 8 here) k bandwidth-bound
    argmax+mask sweeps over the same rows are ~100x cheaper. Tie-breaking
    is identical to lax.top_k (equal values ordered by ascending index:
    argmax returns the first maximum). Returns (values, indices), both
    [..., k], values descending."""
    neg = jnp.asarray(-jnp.inf, x.dtype)
    lead = x.shape[:-1]
    grid = jnp.ix_(*(jnp.arange(n) for n in lead)) if lead else ()

    def one(carry, _):
        idx = jnp.argmax(carry, axis=-1)
        val = jnp.take_along_axis(carry, idx[..., None], axis=-1)[..., 0]
        # scatter ONE element per row instead of a one_hot+where pass: the
        # where form re-wrote the whole [C, B*V] array every sweep (~32 MB
        # per sweep at gen_batch=64); the scatter updates in place on the
        # scan-donated carry
        nxt = carry.at[grid + (idx,)].set(neg)
        return nxt, (val, idx)

    _, (vals, idxs) = jax.lax.scan(one, x, None, length=k)
    perm = tuple(range(1, x.ndim)) + (0,)
    return jnp.transpose(vals, perm), jnp.transpose(idxs, perm)


class BeamState(NamedTuple):
    step: jnp.ndarray            # [C] i32 — tokens generated so far
    last_tokens: jnp.ndarray     # [C, B] next forward input
    beam_scores: jnp.ndarray     # [C, B] running sum-logprobs
    tokens: jnp.ndarray          # [C, B, max_new] generated tokens per beam
    caches: Tuple                # split KV cache: prompt [C] + gen [C*B]
    taps: jnp.ndarray            # [C, max_new, D] hidden taps of leading beam
    hyp_scores: jnp.ndarray      # [C, B] finished-hypothesis scores (len-pen)
    hyp_tokens: jnp.ndarray      # [C, B, max_new]
    hyp_lens: jnp.ndarray        # [C, B]
    done: jnp.ndarray            # [C] bool


def _gather_caches(caches, rows):
    """Beam-ancestry reorder on a SPLIT cache: only the per-beam GENERATED
    part moves (``g*`` keys). The prompt part is identical across a clip's
    beams by construction and the row map never crosses clips, so gathering
    it would be a multi-GB no-op — the old monolithic layout paid exactly
    that every step (~3 GB/step read+write at 7B int8-KV gen_batch=8)."""
    if isinstance(caches, dict):
        # stacked scan-layers layout: [num_layers, C*B, ...]
        return {k: v[:, rows] if k.startswith("g") else v
                for k, v in caches.items()}
    return tuple(
        {k: v[rows] if k.startswith("g") else v for k, v in c.items()}
        for c in caches
    )


def _slot_mask(cur_slots: jnp.ndarray, max_len: int, offset) -> jnp.ndarray:
    """Additive mask [R, 1, T, max_len]: attend cache slots in
    [offset, cur_slot]. ``offset`` is the number of left-pad slots (traced,
    broadcastable against [R, 1, T, max_len] — 0 for exact-length prompts),
    which lets one compiled program serve a whole prompt-length bucket."""
    slots = jnp.arange(max_len)[None, None, None, :]
    ok = jnp.logical_and(
        slots <= cur_slots[:, None, :, None], slots >= offset
    )
    return jnp.where(ok, 0.0, -1e30)


def beam_generate_batched(
    apply_fn: Callable,
    prompt_embeds: jnp.ndarray,
    cfg: LlamaConfig,
    *,
    embed_fn: Callable,
    prompt_len: jnp.ndarray,
    num_beams: int = 4,
    max_new_tokens: int = 200,
    eos_id: int = 2,
    length_penalty: float = 1.0,
    tap_layers: Sequence[int] = (-4, -3, -2, -1),
):
    """Beam-search decode a BATCH of clips in one XLA program.

    Decode is weight-read-bound (every step streams the full parameter set
    from HBM regardless of batch), so running C clips in lockstep multiplies
    tokens/s by ~C until the MXU saturates — the reference's eager HF
    ``generate`` runs strictly one clip at a time
    (extract_wavlm_vicuna.py:245-258). Clips should share a prompt-length
    bucket so the lockstep tail waste stays small; every clip's tokens/taps
    are bit-identical to its own solo run (tested).

    Args:
      apply_fn: bound model fn(inputs_embeds, positions, attn_mask, caches,
        output_hidden_states) -> dict with logits/hidden_states/caches.
      prompt_embeds: [C, P, D], LEFT-padded to the shared bucket P: the last
        ``prompt_len[c]`` slots of clip c are real. Left padding keeps the
        final slot = last real token (so the prefill logit tap stays
        [:, -1]) and the pad slots are masked out of every key set —
        generation is bit-equal to the exact-length program (tested), while
        one compiled program serves the whole bucket (the reference
        recompiles nothing because it runs eager per clip).
      prompt_len: [C] i32 — number of real prompt positions per clip.
      embed_fn: token ids [R, 1] -> embeddings [R, 1, D].

    Returns dict with leading clip axis C:
      tokens [C, max_new]: best hypothesis token ids (EOS-padded),
      n_tokens [C]: its length,
      taps [C, max_new, D]: per-step sum of tap_layers hidden states of the
        leading beam (the reference's feat4 stream, one row per generated
        token; rows >= n_steps are zero),
      n_steps [C]: number of decode forwards taken,
      score [C]: best hypothesis score.
    """
    B = num_beams
    C, P, D = prompt_embeds.shape
    lp = length_penalty
    prompt_len = jnp.broadcast_to(jnp.asarray(prompt_len, jnp.int32), (C,))
    offset = P - prompt_len                 # [C] left-pad slots per clip
    cidx = jnp.arange(C)

    # ---- prefill (prompt hidden states are not tapped — reference [1:]).
    # C streams, not C*B: every beam shares its clip's prompt. The prefill
    # cache is sized to the PROMPT only and becomes the shared read-only
    # prompt part of the split decode cache verbatim — no broadcast copy
    # (the old engine repeat'ed the multi-GB prefill across beams).
    caches = init_cache(cfg, C, P)
    # RoPE positions: pad slots clamp to 0 (their K/V never enter a key set)
    pos = jnp.maximum(jnp.arange(P)[None] - offset[:, None], 0)     # [C, P]
    slot = jnp.broadcast_to(jnp.arange(P)[None], (C, P))
    out = apply_fn(inputs_embeds=prompt_embeds, positions=pos,
                   attn_mask=_slot_mask(slot, P,
                                        offset[:, None, None, None]),
                   caches=caches, last_logit_only=True)
    caches = split_cache_from_prefill(cfg, out["caches"], B, max_new_tokens)
    # static per-clip prompt mask for every decode step: left-pad slots out
    pmask = jnp.where(jnp.arange(P)[None] >= offset[:, None], 0.0, -1e30)
    logp = jax.nn.log_softmax(out["logits"][:, -1].astype(jnp.float32), axis=-1)

    # HF init: only beam 0 counts on the first selection ([C, 1, V] logp
    # broadcasts over the beam axis)
    init_bias = jnp.where(jnp.arange(B) == 0, 0.0, NEG)
    scores0 = logp[:, None, :] + init_bias[None, :, None]           # [C, B, V]
    V = scores0.shape[-1]
    top_vals, top_idx = exact_topk(scores0.reshape(C, B * V), B)
    # (HF would take 2B and filter EOS; at step 0 min_length=1 allows EOS,
    # but an EOS-only prompt continuation is degenerate — handled below by
    # the same candidate machinery from step 1 on. For step 0 we drop EOS
    # candidates into the pool too.)
    tokens0 = (top_idx % V).astype(jnp.int32)                       # [C, B]

    tokens = jnp.full((C, B, max_new_tokens), eos_id, jnp.int32)
    tokens = tokens.at[:, :, 0].set(tokens0)
    state = BeamState(
        step=jnp.full((C,), 1, jnp.int32),
        last_tokens=tokens0,
        beam_scores=top_vals,
        tokens=tokens,
        # no gather: every beam's prefill cache is identical by construction
        caches=caches,
        taps=jnp.zeros((C, max_new_tokens, D), jnp.float32),
        hyp_scores=jnp.full((C, B), NEG, jnp.float32),
        hyp_tokens=jnp.full((C, B, max_new_tokens), eos_id, jnp.int32),
        hyp_lens=jnp.zeros((C, B), jnp.int32),
        done=jnp.zeros((C,), bool),
    )

    def cond(s: BeamState):
        return jnp.any(jnp.logical_and(s.step < max_new_tokens,
                                       jnp.logical_not(s.done)))

    def body(s: BeamState) -> BeamState:
        live = jnp.logical_not(s.done)                              # [C]
        # ---- forward one token per (clip, beam) row; RoPE position runs
        # from the real prompt length. Done clips' rows free-run on frozen
        # step values — their outputs are masked. The split-cache attention
        # builds its own generated-slot mask from the cache index; only the
        # static prompt mask is passed.
        rpos = jnp.repeat(prompt_len + s.step - 1, B)[:, None]      # [C*B, 1]
        out = apply_fn(
            inputs_embeds=embed_fn(s.last_tokens.reshape(C * B)[:, None]),
            positions=rpos,
            attn_mask=pmask,
            caches=s.caches,
            # running tap SUM in the model (LlamaModel.tap_sum_layers,
            # reference clamp semantics included) — stacking all
            # num_layers hidden states per step was pure HBM traffic
            tap_sum_layers=tuple(tap_layers),
        )
        # leading beam of clip c = row c*B (top_k output is sorted)
        tap = out["tap_sum"][:, 0].reshape(C, B, D)[:, 0]           # [C, D]
        row = jnp.arange(max_new_tokens)[None, :] == (s.step - 1)[:, None]
        taps = jnp.where(jnp.logical_and(row, live[:, None])[:, :, None],
                         tap[:, None, :], s.taps)

        logp = jax.nn.log_softmax(
            out["logits"][:, -1].astype(jnp.float32), axis=-1
        ).reshape(C, B, V)
        cand = s.beam_scores[:, :, None] + logp                     # [C, B, V]
        top_vals, top_idx = exact_topk(cand.reshape(C, B * V), 2 * B)
        cand_beam = top_idx // V                                    # [C, 2B]
        cand_tok = (top_idx % V).astype(jnp.int32)
        is_eos = cand_tok == eos_id

        # ---- EOS candidates ranked < B enter the hypothesis pool.
        # HF pushes them SEQUENTIALLY, each replacing the current worst if
        # strictly better — which equals one top-B merge of (pool ∪
        # pushable candidates) with ties resolved pool-first then by
        # candidate rank (a boundary tie never evicts an incumbent and an
        # earlier candidate wins over a later equal one — exactly
        # exact_topk's first-index tie rule over [pool | candidates]).
        # The 2B-iteration fori_loop this replaces was measurable per-step
        # serial overhead in the decode profile.
        cur_len = s.step.astype(jnp.float32)  # generated length incl. this EOS? HF: cur_len tokens before eos
        hyp_cand_score = top_vals / (cur_len[:, None] ** lp)        # [C, 2B]
        rank = jnp.arange(2 * B)
        push = jnp.logical_and(jnp.logical_and(is_eos, rank[None] < B),
                               live[:, None])

        cand_scores = jnp.where(push, hyp_cand_score, NEG)          # [C, 2B]
        merged = jnp.concatenate([s.hyp_scores, cand_scores], axis=1)
        hyp_scores, sel_idx = exact_topk(merged, B)                 # [C, B]
        # candidate i's hypothesis = the pre-update tokens of its origin
        # beam (the EOS itself is not stored — HF records cur_len tokens)
        cand_seqs = jnp.take_along_axis(
            s.tokens, cand_beam[:, :, None], axis=1)                # [C, 2B, N]
        all_tokens = jnp.concatenate([s.hyp_tokens, cand_seqs], axis=1)
        hyp_tokens = jnp.take_along_axis(
            all_tokens, sel_idx[:, :, None], axis=1)
        all_lens = jnp.concatenate(
            [s.hyp_lens, jnp.broadcast_to(s.step[:, None], (C, 2 * B))],
            axis=1)
        hyp_lens = jnp.take_along_axis(all_lens, sel_idx, axis=1)

        # ---- first B non-EOS candidates continue as running beams
        live_rank = jnp.cumsum(
            jnp.logical_not(is_eos).astype(jnp.int32), axis=1) - 1
        # slot b gets the candidate i where live_rank[i] == b and not eos
        slot_of = jnp.where(jnp.logical_not(is_eos), live_rank, 2 * B)
        sel = jnp.argmax(slot_of[:, None, :] == jnp.arange(B)[None, :, None],
                         axis=2)                                    # [C, B]
        new_scores = jnp.take_along_axis(top_vals, sel, axis=1)
        new_beam_idx = jnp.take_along_axis(cand_beam, sel, axis=1)
        new_tok = jnp.take_along_axis(cand_tok, sel, axis=1)

        tokens = jnp.take_along_axis(s.tokens, new_beam_idx[:, :, None],
                                     axis=1)
        col = jnp.arange(max_new_tokens)[None, None, :] == s.step[:, None, None]
        tokens = jnp.where(col, new_tok[:, :, None], tokens)
        # caches are NOT frozen on done (see module docstring); everything
        # consumed downstream is.
        rows = (cidx[:, None] * B + new_beam_idx).reshape(-1)       # [C*B]
        caches = _gather_caches(out["caches"], rows)

        # ---- HF is_done (early_stopping=False, lp>0):
        n_hyps = jnp.sum(hyp_scores > NEG / 2, axis=1)
        best_attainable = jnp.max(new_scores, axis=1) / ((cur_len + 1.0) ** lp)
        done_now = jnp.logical_and(n_hyps >= B,
                                   jnp.min(hyp_scores, axis=1)
                                   >= best_attainable)

        frz = lambda new, old: jnp.where(  # noqa: E731 — freeze done clips
            jnp.reshape(s.done, (C,) + (1,) * (new.ndim - 1)), old, new)
        return BeamState(
            step=frz(s.step + 1, s.step),
            last_tokens=frz(new_tok, s.last_tokens),
            beam_scores=frz(new_scores, s.beam_scores),
            tokens=frz(tokens, s.tokens),
            caches=caches,
            taps=taps,  # already guarded by `live`
            hyp_scores=frz(hyp_scores, s.hyp_scores),
            hyp_tokens=frz(hyp_tokens, s.hyp_tokens),
            hyp_lens=frz(hyp_lens, s.hyp_lens),
            done=jnp.logical_or(s.done, done_now),
        )

    final = jax.lax.while_loop(cond, body, state)

    # ---- finalize: fill the pool with running beams (HF finalize)
    run_score = final.beam_scores / (
        final.step.astype(jnp.float32)[:, None] ** lp)              # [C, B]

    def finalize_one(i, carry):
        hs_, ht_, hl_ = carry
        worst = jnp.argmin(hs_, axis=1)
        worst_val = hs_[cidx, worst]
        better = run_score[:, i] > worst_val
        hs_ = hs_.at[cidx, worst].set(
            jnp.where(better, run_score[:, i], worst_val))
        ht_ = ht_.at[cidx, worst].set(
            jnp.where(better[:, None], final.tokens[:, i], ht_[cidx, worst]))
        hl_ = hl_.at[cidx, worst].set(
            jnp.where(better, final.step, hl_[cidx, worst]))
        return hs_, ht_, hl_

    hyp_scores, hyp_tokens, hyp_lens = jax.lax.fori_loop(
        0, B, finalize_one,
        (final.hyp_scores, final.hyp_tokens, final.hyp_lens)
    )
    best = jnp.argmax(hyp_scores, axis=1)                           # [C]
    return {
        "tokens": hyp_tokens[cidx, best],
        "n_tokens": hyp_lens[cidx, best],
        "taps": final.taps,
        "n_steps": final.step,
        "score": hyp_scores[cidx, best],
    }


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
    """Single-clip beam-search decode: the C=1 case of the batched engine
    (see :func:`beam_generate_batched` for argument semantics; here
    ``prompt_embeds`` is [1, P, D] and ``prompt_len`` an optional traced
    scalar). Returns the same dict without the leading clip axis."""
    P = prompt_embeds.shape[1]
    if prompt_len is None:
        prompt_len = jnp.int32(P)
    out = beam_generate_batched(
        apply_fn, prompt_embeds[:1], cfg, embed_fn=embed_fn,
        prompt_len=jnp.reshape(prompt_len, (1,)),
        num_beams=num_beams, max_new_tokens=max_new_tokens, eos_id=eos_id,
        length_penalty=length_penalty, tap_layers=tap_layers,
    )
    return {k: v[0] for k, v in out.items()}


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
                       caches=caches, tap_sum_layers=tuple(tap_layers))
        tap = out["tap_sum"][0, 0]
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
