"""Training losses, re-derived as vectorized JAX from the reference semantics.

Reference: ``toolkit/utils/loss.py`` (torch modules). Numerics match the
reference definitions exactly (verified in tests/test_losses.py against the
torch implementations); the RnC loss replaces the reference's O(n) python
loop over ranks (loss.py:299-313) with a single masked-logsumexp einsum.

All functions are pure and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _as_2d(x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim == 1:
        return x.reshape(-1, 1)
    if x.ndim == 3:
        return x.reshape(x.shape[0], -1)
    return x


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Sum-of-squares / batch-size (reference MSELoss, loss.py:19-33)."""
    pred, target = _as_2d(pred), _as_2d(target)
    return jnp.sum((pred - target) ** 2) / pred.shape[0]


def rmse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """sqrt(mean((p-t)^2)) over all elements (reference RMSELoss, loss.py:37-51)."""
    pred, target = _as_2d(pred), _as_2d(target)
    return jnp.sqrt(jnp.mean((pred - target) ** 2))


def ce_loss(pred_logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """log_softmax + NLL(sum)/batch (reference CELoss, loss.py:6-16)."""
    logp = jax.nn.log_softmax(pred_logits, axis=1)
    target = target.astype(jnp.int32)
    picked = jnp.take_along_axis(logp, target[:, None], axis=1)
    return -jnp.sum(picked) / pred_logits.shape[0]


def kl_loss(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Symmetric batchmean KL (reference KLLoss, loss.py:74-97)."""

    def _kl(a_logits, b_logits):
        # KLDiv(log_softmax(a) || softmax(b)) with batchmean reduction:
        # sum over elements of softmax(b) * (log softmax(b) - log softmax(a)) / B.
        log_a = jax.nn.log_softmax(a_logits, axis=-1)
        log_b = jax.nn.log_softmax(b_logits, axis=-1)
        b = jnp.exp(log_b)
        return jnp.sum(b * (log_b - log_a)) / a_logits.shape[0]

    return (_kl(p, q) + _kl(q, p)) / 2.0


def cosine_similarity_loss(u: jnp.ndarray, v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """mean(1 - cos(u, v)) over the batch (reference loss.py:100-106)."""
    un = jnp.linalg.norm(u, axis=1)
    vn = jnp.linalg.norm(v, axis=1)
    cos = jnp.sum(u * v, axis=1) / jnp.maximum(un * vn, eps)
    return jnp.mean(1.0 - cos)


def cosine_similarity_loss_seq(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Per-slot cosine loss summed over the sequence axis (loss.py:108-119)."""
    if u.ndim == 2:
        return cosine_similarity_loss(u, v)
    # [B, S, D] -> sum of per-slot losses; vectorized over S.
    un = jnp.linalg.norm(u, axis=2)
    vn = jnp.linalg.norm(v, axis=2)
    cos = jnp.sum(u * v, axis=2) / jnp.maximum(un * vn, 1e-8)
    return jnp.sum(jnp.mean(1.0 - cos, axis=0))


def mi_loss(feats: list[jnp.ndarray]) -> jnp.ndarray:
    """Mean pairwise symmetric KL across a feature list (loss.py:123-139)."""
    n = len(feats)
    total = 0.0
    count = 0
    for i in range(n):
        for j in range(n):
            if i != j:
                total = total + kl_loss(feats[i], feats[j])
                count += 1
    return total / count


def mosei_emo_loss(pred: jnp.ndarray, target: jnp.ndarray, vals: jnp.ndarray) -> jnp.ndarray:
    """Entropy-weighted per-sample MSE with a synthetic neutral channel
    (reference MoseiEmoLoss, loss.py:54-71)."""
    vals = vals.reshape(-1, 1)
    neutral = 3.0 - jnp.abs(vals)
    target = jnp.concatenate([target, neutral], axis=1)
    mse_per = jnp.mean((pred - target) ** 2, axis=1)
    probs = jax.nn.softmax(target, axis=1)
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-12), axis=1)
    weights = 1.0 / (entropy + 1.0)
    return jnp.sum(weights * mse_per) / jnp.sum(weights)


def supcon_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
    contrast_mode: str = "all",
) -> jnp.ndarray:
    """Supervised contrastive loss (reference SupConLoss, loss.py:143-240)."""
    assert features.ndim >= 3, "features must be [bsz, n_views, ...]"
    if features.ndim > 3:
        features = features.reshape(features.shape[0], features.shape[1], -1)
    bsz, n_views = features.shape[0], features.shape[1]

    if labels is not None and mask is not None:
        raise ValueError("Cannot define both labels and mask")
    if labels is None and mask is None:
        mask = jnp.eye(bsz, dtype=jnp.float32)
    elif labels is not None:
        labels = labels.reshape(-1, 1)
        mask = (labels == labels.T).astype(jnp.float32)
    else:
        mask = mask.astype(jnp.float32)

    contrast_feature = jnp.concatenate(jnp.split(features, n_views, axis=1), axis=0).squeeze(1)
    if contrast_mode == "one":
        anchor_feature, anchor_count = features[:, 0], 1
    else:
        anchor_feature, anchor_count = contrast_feature, n_views

    logits = anchor_feature @ contrast_feature.T / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))

    mask = jnp.tile(mask, (anchor_count, n_views))
    n_anchor = bsz * anchor_count
    idx = jnp.arange(n_anchor)
    logits_mask = jnp.ones_like(mask).at[idx, idx].set(0.0)
    mask = mask * logits_mask

    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.sum(exp_logits, axis=1, keepdims=True))
    mask_pos = jnp.sum(mask, axis=1)
    mask_pos = jnp.where(mask_pos < 1e-6, 1.0, mask_pos)
    mean_log_prob_pos = jnp.sum(mask * log_prob, axis=1) / mask_pos
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    return jnp.mean(loss.reshape(anchor_count, bsz))


def rnc_loss(
    features: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 2.0,
) -> jnp.ndarray:
    """Rank-N-Contrast regression-contrastive loss.

    Reference: RnCLoss (loss.py:271-315) — temperature 2, L1 label distance,
    negative-L2 feature similarity, and a per-rank python loop. Re-derived as
    one vectorized masked-log-sum over a [n, n-1, n-1] mask tensor; matches
    the loop numerics (incl. the -0.0001 slack on the negative mask at
    loss.py:303) to float tolerance.

    Args:
      features: [bs, 2, feat_dim] two views per sample.
      labels:   [bs, label_dim] (label_dim usually 1).
    """
    feats = jnp.concatenate([features[:, 0], features[:, 1]], axis=0)  # [2bs, D]
    labels = jnp.tile(labels, (2, 1))                                   # [2bs, L]

    label_diffs = jnp.sum(jnp.abs(labels[:, None, :] - labels[None, :, :]), axis=-1)
    # Safe pairwise L2: plain norm has a NaN gradient at zero distance (the
    # diagonal; torch avoids it because masked_select drops those entries
    # from the graph). Zero-distance pairs get subgradient 0, like torch.
    sq = jnp.sum((feats[:, None, :] - feats[None, :, :]) ** 2, axis=-1)
    sim = -jnp.sqrt(jnp.where(sq > 0.0, sq, 1.0))
    sim = jnp.where(sq > 0.0, sim, 0.0)
    logits = sim / temperature
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True))

    # The diagonal is dropped by MASKING on the full [n, n] matrices, not by
    # _drop_diagonal gathers: take_along_axis at [n, n-1] lowers to a
    # scalar-core gather on TPU — measured 634 us PER CALL at n=256 on v5e
    # (profiles/train_hlo_top.md fusion.2/3/4 + their backward scatters were
    # ~3 ms of a 10.5 ms train step). Values at masked positions never
    # contribute: exp_logits[i,i] is zeroed before the denominator sum, and
    # the final per-pair sum is masked to k != i, so every denom[i, k!=i]
    # equals the gathered version's entry exactly (neg_mask only compares
    # label_diffs values at (i,k)/(i,j), which masking leaves untouched).
    n = logits.shape[0]
    offdiag = 1.0 - jnp.eye(n, dtype=logits.dtype)
    exp_logits = jnp.exp(logits) * offdiag                    # e[i, i] = 0

    # neg_mask[i, k, j] = label_diffs[i, j] >= label_diffs[i, k] - 1e-4
    neg_mask = (
        label_diffs[:, None, :] >= label_diffs[:, :, None] - 0.0001
    ).astype(logits.dtype)
    # denom[i, k] = sum_{j != i} neg_mask[i, k, j] * exp_logits[i, j]
    denom = jnp.einsum("ikj,ij->ik", neg_mask, exp_logits)
    pos_log_probs = (logits - jnp.log(denom)) * offdiag
    return -jnp.sum(pos_log_probs) / (n * (n - 1))
