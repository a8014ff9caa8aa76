"""Batched Levenshtein distance under jit (device-side, differentiation-free).

The host-side scorer (``utils/metrics.py`` -> ``native/edit_distance.cpp``)
serves validation; this kernel exists so SEQUENCE-LEVEL objectives (MWER,
``objectives/losses.mwer_loss``) can compute per-hypothesis risks INSIDE
the fused train step — no host round-trip, no dynamic shapes.

Vectorized DP in the classic TPU shape: ``lax.scan`` over hypothesis
positions carries one DP row [..., U2+1]; the within-row insertion
recurrence ``D[i,j] <- D[i,j-1]+1`` — a serial prefix dependency — is
resolved in O(log U2) with an associative min-scan over ``row - j``
(min-plus prefix over a unit-cost chain), so every scan step is pure
elementwise VPU work over the whole batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def batched_edit_distance(
    hyp: jax.Array,       # [..., U1] int tokens
    hyp_lens: jax.Array,  # [...]     valid lengths
    ref: jax.Array,       # [..., U2] int tokens
    ref_lens: jax.Array,  # [...]     valid lengths
) -> jax.Array:
    """-> int32 Levenshtein distances [...] between the valid prefixes.

    Tokens beyond the given lengths are ignored (any padding value is
    fine).  Batch dims broadcast like the data: ``hyp [B,K,U1]`` against
    ``ref [B,K,U2]`` (tile the reference over K for n-best scoring).
    """
    hyp = hyp.astype(jnp.int32)
    ref = ref.astype(jnp.int32)
    batch_shape = hyp.shape[:-1]
    u1, u2 = hyp.shape[-1], ref.shape[-1]
    j = jnp.arange(u2 + 1, dtype=jnp.int32)

    # D[0, j] = j
    row0 = jnp.broadcast_to(j, batch_shape + (u2 + 1,))

    # ref validity per column j>=1 (invalid columns are never read: the
    # answer is gathered at ref_lens; but keep their costs consistent)
    hyp_t = jnp.moveaxis(hyp, -1, 0)              # [U1, ...]

    def step(prev_row, inp):
        h_i, i1 = inp                              # h_i [...], i1 scalar
        sub_cost = (ref != h_i[..., None]).astype(jnp.int32)   # [..., U2]
        sub = prev_row[..., :-1] + sub_cost
        dele = prev_row[..., 1:] + 1
        base = jnp.minimum(sub, dele)              # [..., U2] (cols 1..U2)
        base = jnp.concatenate(
            [jnp.broadcast_to(i1, batch_shape)[..., None], base], axis=-1
        )                                          # col 0: D[i,0] = i
        # insertion closure: new[j] = min_k<=j (base[k] + (j-k))
        #                  = cummin(base - j') + j
        shifted = base - j
        closed = lax.associative_scan(jnp.minimum, shifted, axis=-1)
        new_row = closed + j
        return new_row, new_row

    i1s = jnp.arange(1, u1 + 1, dtype=jnp.int32)
    _, rows = lax.scan(step, row0, (hyp_t, i1s))   # [U1, ..., U2+1]
    rows = jnp.concatenate([row0[None], rows], axis=0)  # [U1+1, ..., U2+1]

    # gather D[hyp_len, ref_len] per batch element
    rows = jnp.moveaxis(rows, 0, -2)               # [..., U1+1, U2+1]
    picked = jnp.take_along_axis(
        rows, hyp_lens.astype(jnp.int32)[..., None, None], axis=-2
    )[..., 0, :]
    return jnp.take_along_axis(
        picked, ref_lens.astype(jnp.int32)[..., None], axis=-1
    )[..., 0]
