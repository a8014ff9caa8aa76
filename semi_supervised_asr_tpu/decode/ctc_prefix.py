"""CTC prefix scores for one-pass joint CTC/attention beam search.

The hybrid decode of Watanabe et al. 2017 ("Hybrid CTC/Attention
Architecture for End-to-End Speech Recognition"): while the attention
beam expands, every candidate continuation ``g·c`` is ALSO scored by the
encoder CTC head's *prefix probability*

    p_ctc(g·c, ...) = sum over all label sequences starting with g·c,

and the beam ranks by ``(1-w)·logp_att + w·Δlogp_ctc`` per step — unlike
the n-best rescoring already in decode/beam.py, the CTC evidence steers
WHICH prefixes survive, which is what recovers deletions/looping the
attention model alone commits.  (Reference counterpart: none — the
reference repo has no CTC head; this matches the contemporaneous
toolkit's flagship decode, the ESPnet row of PAPERS.md.)

TPU-first formulation: the textbook implementation advances the per-
frame forward variables gamma with a serial loop over T.  Both
recursions here are UNROLLED into closed forms over cumulative
log-sum-exp (``lax.cumlogsumexp``), so a beam step issues two fused
cumulative ops on [rows, T(, V)] tensors instead of T sequential
carries — no ``lax.scan`` anywhere:

    gn_t(g·c) = cum_c[t] + logcumsumexp_t( phi_t - cum_c[t-1] )
    gb_t(h)   = cum_b[t] + logcumsumexp_{tau<=t-1}( gn_tau(h) - cum_b[tau] )

where ``gn_t(h)`` / ``gb_t(h)`` are the log-probabilities of alignments
over frames [0, t] that collapse to exactly ``h`` and end in h's last
token / in blank, ``phi_t = gb_{t-1}(g) [+ gn_{t-1}(g) if c != last(g)]``
is the "g just finished" mass, and ``cum_c``/``cum_b`` are cumulative
per-frame log-probs of c/blank.  The candidate prefix score is
``psi(g·c) = logsumexp_t( phi_t + logp_t(c) )`` and the EOS (finish)
score is ``gn_{T-1}(g) + gb_{T-1}(g)``.

Padding contract: invalid frames are rewritten to emit blank with
probability 1 (others get a large finite penalty, NOT -inf — the closed
forms subtract cumulative sums, and infinities would poison them), so
trailing pads are score-neutral and the same arrays serve every row of
a bucketed batch.  Blank is PAD (data/vocab.py), matching the CTC loss.

Correctness is pinned by tests/test_ctc_prefix.py: brute-force
enumeration of all alignments on tiny lattices, equality of the
accumulated one-pass score with the full-sequence CTC forward
probability, and jit-beam == Python-oracle joint beam.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from semi_supervised_asr_tpu.data.vocab import PAD

NEG = -1.0e30      # score-level "impossible" (same convention as beam.py)
PAD_NEG = -1.0e4   # per-frame penalty for non-blank at padded frames:
                   # exp(-1e4) == 0.0 in fp32, but cumulative sums of it
                   # stay finite (see module docstring)


def masked_ctc_logp(logits: jax.Array, enc_mask: jax.Array) -> jax.Array:
    """Log-softmax the CTC head logits and rewrite padded frames to
    emit blank deterministically -> [B, T, V] fp32."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    v = logp.shape[-1]
    pad_row = jnp.full((v,), PAD_NEG, jnp.float32).at[PAD].set(0.0)
    return jnp.where(enc_mask[..., None], logp, pad_row[None, None, :])


def prefix_init(logp: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Forward variables of the EMPTY prefix -> (gn [R, T], gb [R, T]).

    gb_t(empty) = cumulative blank mass through t; gn_t(empty) = 0 prob.
    """
    r, t, _ = logp.shape
    gb = jnp.cumsum(logp[:, :, PAD], axis=1)
    gn = jnp.full((r, t), NEG, jnp.float32)
    return gn, gb


def _shift1(x: jax.Array, fill) -> jax.Array:
    """[R, T] -> value at t-1 (column 0 <- fill, broadcast over rows)."""
    return jnp.concatenate(
        [jnp.broadcast_to(jnp.asarray(fill, x.dtype),
                          x.shape[:1] + (1,)), x[:, :-1]],
        axis=1,
    )


def candidate_scores(
    gn: jax.Array,        # [R, T] parent gamma^n
    gb: jax.Array,        # [R, T] parent gamma^b
    logp: jax.Array,      # [R, T, V] masked_ctc_logp output
    last: jax.Array,      # [R] int32 last token of the parent prefix
    empty: jax.Array,     # [R] bool: parent prefix is empty
) -> tuple[jax.Array, jax.Array]:
    """-> (psi [R, V] prefix log-score of every extension g·c,
           eos [R] log-score of finishing at g).

    Column PAD (= blank) is NOT a label extension and is pinned to NEG.
    """
    gb_prev = _shift1(gb, NEG)
    gb_prev = gb_prev.at[:, 0].set(jnp.where(empty, 0.0, NEG))
    gn_prev = _shift1(gn, NEG)

    # phi[r, t, c]: mass of "parent finished by t-1, c starts at t"
    same = last[:, None] == jnp.arange(logp.shape[-1])[None, :]   # [R, V]
    phi = jnp.where(
        same[:, None, :], gb_prev[:, :, None],
        jnp.logaddexp(gb_prev[:, :, None], gn_prev[:, :, None]),
    )
    psi = jax.nn.logsumexp(phi + logp, axis=1)                    # [R, V]
    psi = psi.at[:, PAD].set(NEG)
    eos = jnp.logaddexp(gn[:, -1], gb[:, -1])
    return psi, eos


def advance(
    gn: jax.Array,        # [R, T] parent gamma^n (post-gather)
    gb: jax.Array,        # [R, T] parent gamma^b (post-gather)
    logp: jax.Array,      # [R, T, V]
    last: jax.Array,      # [R] parent's last token (post-gather)
    empty: jax.Array,     # [R] parent prefix empty
    chosen: jax.Array,    # [R] int32 token appended this step
) -> tuple[jax.Array, jax.Array]:
    """Forward variables of g·chosen -> (gn' [R, T], gb' [R, T])."""
    r, t = gn.shape
    gb_prev = _shift1(gb, NEG)
    gb_prev = gb_prev.at[:, 0].set(jnp.where(empty, 0.0, NEG))
    gn_prev = _shift1(gn, NEG)
    phi = jnp.where(chosen[:, None] == last[:, None],
                    gb_prev, jnp.logaddexp(gb_prev, gn_prev))     # [R, T]

    lp_c = jnp.take_along_axis(
        logp, chosen[:, None, None], axis=2
    )[:, :, 0]                                                    # [R, T]
    cum_c = jnp.cumsum(lp_c, axis=1)
    # gn'[t] = lse_{tau<=t}( phi_tau + sum_{s=tau..t} lp_c[s] )
    #        = cum_c[t] + logcumsumexp_t( phi - cum_c[t-1] )
    gn_new = cum_c + lax.cumlogsumexp(phi - _shift1(cum_c, 0.0), axis=1)

    cum_b = jnp.cumsum(logp[:, :, PAD], axis=1)
    # gb'[t] = lse_{tau<=t-1}( gn'[tau] + sum_{s=tau+1..t} lp_b[s] )
    #        = cum_b[t] + logcumsumexp_{tau<=t-1}( gn'[tau] - cum_b[tau] )
    z = lax.cumlogsumexp(gn_new - cum_b, axis=1)
    gb_new = cum_b + _shift1(z, NEG)
    return gn_new, gb_new
