"""RNN-T (transducer) loss: jit forward DP over anti-diagonals.

-log P(labels | encoder) marginalized over all blank/emit alignments
(Graves 2012, "Sequence Transduction with RNNs").  The [T, U+1] lattice
recursion

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t, u-1] + emit[t, u-1])

is serial in BOTH t and u, so a nested scan would run T*U sequential
steps.  TPU-first shape: every cell on an anti-diagonal d = t+u is
independent, so the whole lattice is ONE ``lax.scan`` of T+U steps whose
body is a vectorized [B, U+1] logaddexp — the warp-transducer trick
expressed as XLA ops.  The diagonal gathers are hoisted out of the scan
as a single skew transform (one static gather per input), leaving pure
slicing inside the loop.  Gradients flow by autodiff through the scan
(reverse-mode replays the diagonals backwards).

Blank id = PAD (0) — the same convention as objectives/losses.ctc_loss.
Padded rows/frames never leak: a padded cell can only be REACHED through
-inf skew entries, and the per-sequence terminal gather reads only
(T_b-1, U_b), which lies inside the valid region.

Numpy oracle + finite-difference gradient parity:
tests/test_transducer.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def transducer_loss(
    logits: jax.Array,       # [B, T, U+1, V] joint-network outputs (pre-softmax)
    enc_lens: jax.Array,     # [B] valid encoder frames T_b >= 1
    labels: jax.Array,       # [B, U] label ids (no blank, no EOS needed)
    label_lens: jax.Array,   # [B] valid labels U_b <= U
    blank: int = 0,
    real: jax.Array | None = None,   # [B] bool — remainder-row mask
) -> tuple[jax.Array, jax.Array]:
    """-> (mean -log-likelihood over real rows, per-utt -ll [B])."""
    b, t, u1, v = logits.shape
    u = u1 - 1
    assert labels.shape == (b, u), (labels.shape, (b, u))
    blank_lp, emit_lp = lattice_terms(logits, labels, blank)
    return transducer_loss_from_parts(
        blank_lp, emit_lp, enc_lens, label_lens, real=real
    )


def lattice_terms(
    logits: jax.Array,       # [B, T, U+1, V]
    labels: jax.Array,       # [B, U]
    blank: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Reduce joint logits to the two [B, T, U+1] tensors the DP needs.

    The V axis dies here — everything downstream is V-free, which is
    what makes the chunked large-vocab path possible
    (models/transducer.joint_lattice_terms)."""
    b, t, u1, _ = logits.shape
    u = u1 - 1
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    blank_lp = lp[..., blank]                                   # [B, T, U+1]
    emit_lp = jnp.take_along_axis(
        lp[:, :, :u, :], labels[:, None, :, None], axis=3
    )[..., 0]                                                   # [B, T, U]
    # emitting past the last label is impossible
    emit_lp = jnp.concatenate(
        [emit_lp, jnp.full((b, t, 1), NEG_INF)], axis=2
    )                                                           # [B, T, U+1]
    return blank_lp, emit_lp


def transducer_loss_from_parts(
    blank_lp: jax.Array,     # [B, T, U+1] log P(blank | t, u)
    emit_lp: jax.Array,      # [B, T, U+1] log P(y_{u+1} | t, u), last col -inf
    enc_lens: jax.Array,
    label_lens: jax.Array,
    real: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """The anti-diagonal DP on precomputed lattice terms (see module
    docstring) -> (mean -ll over real rows, per-utt -ll [B])."""
    b, t, u1 = blank_lp.shape

    # skew to diagonals: skew[b, d, u] = X[b, d-u, u] (else -inf).
    d_count = t + u1 - 1                    # diagonals 0 .. (T-1)+(U)
    d_idx = jnp.arange(d_count)[:, None]
    u_idx = jnp.arange(u1)[None, :]
    t_idx = d_idx - u_idx                                       # [D, U+1]
    on_grid = (t_idx >= 0) & (t_idx < t)

    def skew(x):                                                # [B,T,U+1]
        g = x[:, jnp.clip(t_idx, 0, t - 1), u_idx]              # [B,D,U+1]
        return jnp.where(on_grid[None], g, NEG_INF)

    blank_skew = skew(blank_lp)
    emit_skew = skew(emit_lp)

    alpha0 = jnp.full((b, u1), NEG_INF).at[:, 0].set(0.0)

    def step(alpha, rows):
        blank_prev, emit_prev = rows                            # [B, U+1]
        stay = alpha + blank_prev                               # from (t-1, u)
        move = alpha[:, :-1] + emit_prev[:, :-1]                # from (t, u-1)
        move = jnp.pad(
            move, ((0, 0), (1, 0)), constant_values=NEG_INF
        )
        new = jnp.logaddexp(stay, move)
        return new, new

    # diagonal d consumes diagonal d-1's skew rows
    _, rest = jax.lax.scan(
        step, alpha0,
        (blank_skew[:, :-1].swapaxes(0, 1), emit_skew[:, :-1].swapaxes(0, 1)),
    )                                                           # [D-1, B, U+1]
    alphas = jnp.concatenate([alpha0[None], rest], axis=0)      # [D, B, U+1]

    # terminal: ll_b = alpha[T_b-1, U_b] + blank_lp[T_b-1, U_b]
    d_fin = enc_lens - 1 + label_lens                           # [B]
    bi = jnp.arange(b)
    alpha_fin = alphas[d_fin, bi, label_lens]
    last_blank = blank_lp[bi, enc_lens - 1, label_lens]
    nll = -(alpha_fin + last_blank)                             # [B]
    w = jnp.ones((b,)) if real is None else real.astype(jnp.float32)
    mean = jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1.0)
    return mean, nll
