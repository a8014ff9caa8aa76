"""Batched jit RNN-T greedy decode.

Frame-synchronous: walk encoder frames in ONE ``lax.scan``; at each
frame take up to ``max_symbols`` argmax emissions (a small unrolled
inner loop — every iteration is a [B]-vectorized masked update, no
per-utterance Python).  An utterance stops emitting at a blank, at its
encoder length, or when the output buffer fills; rows finish
independently via masks, so one compile serves the whole batch.

Output slots never written stay PAD (= blank = 0), which the scoring
path already trims (utils/metrics.hyp_len) — transducer hypotheses
score through the same PER/CER/WER machinery as LAS beams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.data.vocab import PAD, SOS
from semi_supervised_asr_tpu.models import transducer as TD


def transducer_greedy_init(
    params: dict, cfg: ModelConfig, b: int, max_u: int, blank: int = PAD,
    track_frames: bool = False, bias: bool = False,
) -> tuple:
    """Fresh greedy carry (pred, predictor state, out, count, score) —
    pass as ``carry`` for chunked streaming decode (decode/streaming.py).
    With ``track_frames`` the carry gains a slot: each token's emission
    frame (-1 until written) — streaming timestamps.  With ``bias`` it
    gains a TRAILING automaton-state slot; the score slot then carries
    model + bias UN-retracted (the transducer_beam convention) so the
    walk resumes exactly across chunks."""
    pred0, state0 = TD.predictor_step(
        params["predictor"], jnp.full((b,), SOS, jnp.int32),
        TD.predictor_init_state(cfg, b), cfg,
    )
    base = (
        pred0, state0,
        jnp.full((b, max_u), blank, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.float32),
    )
    if track_frames:
        base = base + (jnp.full((b, max_u), -1, jnp.int32),)
    if bias:
        base = base + (jnp.zeros((b,), jnp.int32),)
    return base


def transducer_greedy_from_enc(
    params: dict,
    cfg: ModelConfig,
    enc: jax.Array,          # [B, T', 2H]
    enc_mask: jax.Array,     # [B, T']
    max_u: int,
    max_symbols: int = 4,
    blank: int = PAD,
    carry: tuple | None = None,
    return_carry: bool = False,
    track_frames: bool = False,
    frame_base: jax.Array | int = 0,
    bias=None,
) -> tuple[jax.Array, jax.Array]:
    """-> (tokens [B, max_u] PAD-padded, total log-prob [B]).

    ``carry``/``return_carry``: resume/export the frame-scan state so
    chunked streaming decode (feed encoder frames as they arrive) is the
    SAME computation as the full-utterance scan — exactness tested in
    tests/test_streaming_decode.py.

    ``track_frames``: additionally return each token's emission frame
    (``[B, max_u]`` int32, -1 beyond the emitted count) — the
    transducer's native timestamp (``transcribe --timestamps``).  The
    token/score outputs are bitwise those of the untracked scan.
    Streams too: pass a 6-tuple ``carry`` (transducer_greedy_init
    ``track_frames=True``) plus ``frame_base`` = encoder frames already
    consumed, so recorded frames stay ABSOLUTE across chunks; with
    ``return_carry`` the 6-tuple comes back.

    ``bias`` (a biasing.BiasTrie, with the trailing automaton-state
    carry slot from ``transducer_greedy_init(bias=True)``): greedy
    shallow-fusion hotword boosting — each emission decision argmaxes
    over ``logits + delta`` with the blank column pinned to 0 (blank is
    no transition), the carried score accumulates model + bias
    UN-retracted (the transducer_beam convention) so chunked resume is
    exact, and the RETURNED score subtracts the final pending so
    incomplete matches stay score-neutral."""
    b, t, _ = enc.shape
    if bias is not None:
        from semi_supervised_asr_tpu.decode import biasing as BZ
    n_bias = 1 if bias is not None else 0
    if carry is None:
        carry = transducer_greedy_init(params, cfg, b, max_u, blank,
                                       track_frames=track_frames,
                                       bias=bias is not None)
    if track_frames:
        assert len(carry) == 6 + n_bias, (
            "track_frames streaming needs the 6-tuple carry from "
            "transducer_greedy_init(track_frames=True)"
            + (" (+ the bias slot)" if n_bias else "")
        )
    else:
        assert len(carry) == 5 + n_bias, (
            "carry arity does not match (track_frames, bias) — build it "
            "with transducer_greedy_init(track_frames=..., bias=...)"
        )
    node0 = carry[-1] if n_bias else jnp.zeros((b,), jnp.int32)
    carry = carry[: len(carry) - n_bias]
    if track_frames:
        pred0, state0, out0, count0, score0, frames0 = carry
    else:
        pred0, state0, out0, count0, score0 = carry
        frames0 = jnp.full((b, max_u), -1, jnp.int32)

    def frame(carry, inp):
        pred, state, out, count, score, frames, node = carry
        enc_t, valid_t, t_idx = inp                # [B, 2H], [B], []
        emitting = valid_t                         # [B] may still emit
        for _ in range(max_symbols):
            logits = TD.joint_row(params["joint"], enc_t, pred, cfg)
            lp = jax.nn.log_softmax(logits, axis=-1)
            if bias is not None:
                delta = BZ.bias_delta(bias, node)          # [B, V]
                cols = jnp.arange(lp.shape[1],
                                  dtype=jnp.int32)[None, :]
                eff = jnp.where(cols == blank, 0.0, delta)
                tok = jnp.argmax(
                    logits + eff, axis=-1
                ).astype(jnp.int32)
            else:
                tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = emitting & (tok != blank) & (count < max_u)
            # blank consumed where not emitting; add its log-prob once
            # per frame exit below — scores accumulate the chosen path
            score = score + jnp.where(
                emitting,
                jnp.take_along_axis(
                    lp, jnp.where(emit, tok, blank)[:, None], axis=1
                )[:, 0],
                0.0,
            )
            if bias is not None:
                d_tok = jnp.take_along_axis(
                    eff, tok[:, None], axis=1
                )[:, 0]
                score = score + jnp.where(emit, d_tok, 0.0)
                node = jnp.where(
                    emit, BZ.bias_advance(bias, node, tok), node
                )
            slot = (jnp.arange(max_u)[None, :] == count[:, None]) \
                & emit[:, None]
            out = jnp.where(slot, tok[:, None], out)
            if track_frames:
                frames = jnp.where(slot, t_idx, frames)
            new_pred, new_state = TD.predictor_step(
                params["predictor"], tok, state, cfg
            )
            pred = jnp.where(emit[:, None], new_pred, pred)
            state = tuple(
                (jnp.where(emit[:, None], nh, h),
                 jnp.where(emit[:, None], nc, c))
                for (nh, nc), (h, c) in zip(new_state, state)
            )
            count = count + emit.astype(jnp.int32)
            emitting = emitting & emit
        # a path consumes the frame with a blank; rows that spent all
        # max_symbols iterations emitting still owe it (score parity
        # with the beam: every complete path has exactly T' blanks)
        lp = jax.nn.log_softmax(
            TD.joint_row(params["joint"], enc_t, pred, cfg), axis=-1
        )
        score = score + jnp.where(emitting, lp[..., blank], 0.0)
        return (pred, state, out, count, score, frames, node), None

    final, _ = jax.lax.scan(
        frame, (pred0, state0, out0, count0, score0, frames0, node0),
        (enc.swapaxes(0, 1), enc_mask.swapaxes(0, 1),
         jnp.arange(t, dtype=jnp.int32) + jnp.asarray(frame_base,
                                                      jnp.int32)),
    )
    _, _, out, count, score, frames, node = final
    if bias is not None:
        # returned ranking scores subtract pending (incomplete matches
        # are score-neutral); the carry stays UN-retracted so the walk
        # resumes exactly — the transducer_beam convention
        ret_score = score - BZ.bias_pending(bias, node)
    else:
        ret_score = score
    out_carry = final[:5] + ((frames,) if track_frames else ()) \
        + ((node,) if n_bias else ())
    if track_frames and return_carry:
        return out, ret_score, out_carry
    if track_frames:
        return out, ret_score, frames
    if return_carry:
        return out, ret_score, out_carry
    return out, ret_score
