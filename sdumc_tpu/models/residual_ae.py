"""Residual fully-connected autoencoder ("imagination" module).

Reference: ``ResidualAE``
(toolkit/models/wengnet_mosei_mult_views_text_missing.py:116-183). The live
model constructs two of these (so their parameters exist in the released
checkpoint) but the missing-modality substitution that calls them is
commented out (:297-299,342-344); we keep both behaviors — parameters are
always created, the forward substitution is gated by
``ModelConfig.use_imagination``.

Layer-stripping semantics reproduced exactly: the encoder drops its final
activation(+bn)(+dropout) block (:149-152); the decoder interleaves
ReLU(+bn)(+dropout) between all but the last linear (:154-168).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from sdumc_tpu.models.layers import Linear


class ResidualAE(nn.Module):
    layers: Sequence[int]
    n_blocks: int
    input_dim: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x_a, x_t, x_v, *, deterministic: bool = True):
        x_in = jnp.concatenate([x_a, x_t, x_v], axis=-1)
        # transition: Linear(3d, d) -> ReLU -> Linear(d, d)
        x_in = Linear(self.input_dim, name="transition_0")(x_in)
        x_in = nn.relu(x_in)
        x_in = Linear(self.input_dim, name="transition_1")(x_in)

        x_out = x_in
        for blk in range(self.n_blocks):
            # encoder: [Linear -> LeakyReLU -> Dropout]*, last block stripped
            # of its activation+dropout (reference get_encoder :138-152).
            h = x_out
            for i, dim in enumerate(self.layers):
                h = Linear(dim, name=f"encoder_{blk}_{i}")(h)
                if i < len(self.layers) - 1:
                    h = nn.leaky_relu(h, negative_slope=0.01)
                    if self.dropout > 0:
                        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            latent = h
            # decoder: reversed layers + input_dim, ReLU+Dropout between all
            # but the final linear (reference get_decoder :154-168).
            dec_dims = list(reversed(list(self.layers)))[1:] + [self.input_dim]
            h = latent
            for i, dim in enumerate(dec_dims):
                if i > 0:
                    h = nn.relu(h)
                    if self.dropout > 0:
                        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
                h = Linear(dim, name=f"decoder_{blk}_{i}")(h)
            x_out = h + x_t
        return x_out
