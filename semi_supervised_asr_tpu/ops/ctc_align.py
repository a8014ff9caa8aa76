"""Batched jit CTC Viterbi forced alignment (token-level timestamps).

Given frame log-posteriors from the CTC head and a hypothesis (or
reference) token sequence, find the highest-probability CTC path that
realizes the sequence and read off each token's first/last occupied
encoder frame — the standard "CTC segmentation" timing used for
subtitles, error analysis, and long-audio alignment.  Reference
counterpart: the upstream repo decodes text only (no timing surface);
this is the TPU-native extension serving `transcribe --timestamps`.

The DP runs over the usual blank-interleaved state graph (states
``s = 0..2U``; even = blank, odd = token ``(s-1)//2``) as ONE
``lax.scan`` over frames with `[B, S]`-vectorized transitions — no
per-utterance Python.  Backpointers are stacked by the scan (int8,
``[T, B, S]``) and the path is recovered with a second (reverse) scan,
so the whole thing jits and batches.  Rows are masked independently:
frames at/after ``frame_lens`` freeze the lattice (bp = stay), states
beyond ``2 * token_lens`` stay ``-inf``.

Infeasible rows — fewer valid frames than the CTC path needs
(``token_lens`` + forced blanks between repeated tokens) — come back
with ``path_logp = -inf``; their frame outputs are meaningless and
callers must gate on finiteness (transcribe does).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.data.vocab import PAD

NEG = -1e30  # -inf stand-in that survives adds without NaN


def ctc_viterbi_align(
    logp: jax.Array,        # [B, T, V] log-softmax CTC frame posteriors
    frame_lens: jax.Array,  # [B] valid encoder frames
    tokens: jax.Array,      # [B, U] token ids (no blank/EOS; PAD beyond)
    token_lens: jax.Array,  # [B] real token counts (<= U)
    blank: int = PAD,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (starts [B, U], ends [B, U], path_logp [B]).

    ``starts``/``ends`` are inclusive encoder-frame indices of each
    token's occupancy on the Viterbi path; positions at/after
    ``token_lens`` are -1.  Viterbi guarantees every aligned token
    occupies >= 1 frame, so ``starts <= ends`` wherever valid.
    """
    b, t_cap, _ = logp.shape
    u_cap = tokens.shape[1]
    s_cap = 2 * u_cap + 1
    s_idx = jnp.arange(s_cap)                              # [S]
    odd = (s_idx % 2) == 1
    tok_of_state = jnp.clip((s_idx - 1) // 2, 0, u_cap - 1)
    # label emitted by each state (blank for even states)
    labels = jnp.where(
        odd[None, :],
        jnp.take_along_axis(
            tokens, jnp.broadcast_to(tok_of_state[None, :], (b, s_cap)),
            axis=1,
        ),
        blank,
    )                                                      # [B, S]
    # skip transition s-2 -> s: only into a token state whose token
    # differs from the previous token (CTC's repeated-token blank rule)
    prev_tok = jnp.take_along_axis(
        tokens,
        jnp.broadcast_to(jnp.clip(tok_of_state - 1, 0, u_cap - 1)[None, :],
                         (b, s_cap)),
        axis=1,
    )
    can_skip = (
        odd[None, :] & (s_idx >= 2)[None, :]
        & (labels != prev_tok) & (tok_of_state[None, :] >= 1)
    )                                                      # [B, S]
    state_ok = (s_idx[None, :] <= 2 * token_lens[:, None])  # [B, S]

    emit = jnp.take_along_axis(logp, labels[:, None, :], axis=2)
    emit = emit.swapaxes(0, 1)                             # [T, B, S]

    # t = 0: only states 0 (blank) and 1 (first token) can start
    alpha0 = jnp.where(
        (s_idx[None, :] <= jnp.minimum(1, 2 * token_lens[:, None]))
        & state_ok,
        emit[0], NEG,
    )

    def shift(a: jax.Array, k: int) -> jax.Array:
        return jnp.pad(a, ((0, 0), (k, 0)), constant_values=NEG)[:, :s_cap]

    def step(alpha, inp):
        emit_t, active = inp                               # [B,S], [B]
        stay = alpha
        from1 = shift(alpha, 1)
        from2 = jnp.where(can_skip, shift(alpha, 2), NEG)
        cand = jnp.stack([stay, from1, from2])             # [3, B, S]
        bp = jnp.argmax(cand, axis=0).astype(jnp.int8)     # [B, S]
        new = jnp.where(state_ok, jnp.max(cand, axis=0) + emit_t, NEG)
        alpha = jnp.where(active[:, None], new, alpha)
        bp = jnp.where(active[:, None], bp, jnp.int8(0))
        return alpha, bp

    active = (jnp.arange(1, t_cap)[:, None] < frame_lens[None, :])  # [T-1,B]
    alpha_f, bps = jax.lax.scan(step, alpha0, (emit[1:], active))
    # bps[t-1] = how state s at frame t was reached; frame 0 has no bp
    bps = jnp.concatenate(
        [jnp.zeros((1, b, s_cap), jnp.int8), bps], axis=0  # [T, B, S]
    )

    # end state: best of last blank (2U) / last token (2U-1); U=0 rows
    # end (and start) at state 0
    last_blank = 2 * token_lens                            # [B]
    last_tok = jnp.maximum(last_blank - 1, 0)
    ab = jnp.take_along_axis(alpha_f, last_blank[:, None], axis=1)[:, 0]
    at = jnp.take_along_axis(alpha_f, last_tok[:, None], axis=1)[:, 0]
    end_state = jnp.where(
        (token_lens > 0) & (at > ab), last_tok, last_blank
    ).astype(jnp.int32)
    path_logp = jnp.maximum(ab, jnp.where(token_lens > 0, at, NEG))
    path_logp = jnp.where(path_logp <= NEG / 2, -jnp.inf, path_logp)

    def back(cur, bp_t):
        # record the state occupied at frame t, then hop to t-1's state
        delta = jnp.take_along_axis(
            bp_t.astype(jnp.int32), cur[:, None], axis=1
        )[:, 0]
        return cur - delta, cur

    _, states_rev = jax.lax.scan(back, end_state, bps[::-1])
    states = states_rev[::-1].swapaxes(0, 1)               # [B, T]

    # token u occupies frames where the path sits in state 2u+1 (frozen
    # frames at/after frame_lens replay the end state — mask them out)
    valid_t = jnp.arange(t_cap)[None, :] < frame_lens[:, None]
    occ = (
        states[:, :, None] == (2 * jnp.arange(u_cap) + 1)[None, None, :]
    ) & valid_t[:, :, None]                                # [B, T, U]
    any_occ = jnp.any(occ, axis=1)                         # [B, U]
    starts = jnp.argmax(occ, axis=1).astype(jnp.int32)
    ends = (t_cap - 1 - jnp.argmax(occ[:, ::-1], axis=1)).astype(jnp.int32)
    tok_valid = (jnp.arange(u_cap)[None, :] < token_lens[:, None]) & any_occ
    starts = jnp.where(tok_valid, starts, -1)
    ends = jnp.where(tok_valid, ends, -1)
    return starts, ends, path_logp
