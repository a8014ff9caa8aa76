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
    track_frames: bool = False,
) -> tuple:
    """Fresh greedy carry (pred, predictor state, out, count, score) —
    pass as ``carry`` for chunked streaming decode (decode/streaming.py).
    With ``track_frames`` the carry gains a 6th slot: each token's
    emission frame (-1 until written) — streaming timestamps."""
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
        return base + (jnp.full((b, max_u), -1, jnp.int32),)
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
    ``return_carry`` the 6-tuple comes back."""
    b, t, _ = enc.shape
    if carry is None:
        carry = transducer_greedy_init(params, cfg, b, max_u, blank,
                                       track_frames=track_frames)
    if track_frames:
        assert len(carry) == 6, (
            "track_frames streaming needs the 6-tuple carry from "
            "transducer_greedy_init(track_frames=True)"
        )
        pred0, state0, out0, count0, score0, frames0 = carry
    else:
        pred0, state0, out0, count0, score0 = carry
        frames0 = jnp.full((b, max_u), -1, jnp.int32)

    def frame(carry, inp):
        pred, state, out, count, score, frames = carry
        enc_t, valid_t, t_idx = inp                # [B, 2H], [B], []
        emitting = valid_t                         # [B] may still emit
        for _ in range(max_symbols):
            logits = TD.joint_row(params["joint"], enc_t, pred, cfg)
            lp = jax.nn.log_softmax(logits, axis=-1)
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
        return (pred, state, out, count, score, frames), None

    final, _ = jax.lax.scan(
        frame, (pred0, state0, out0, count0, score0, frames0),
        (enc.swapaxes(0, 1), enc_mask.swapaxes(0, 1),
         jnp.arange(t, dtype=jnp.int32) + jnp.asarray(frame_base,
                                                      jnp.int32)),
    )
    _, _, out, count, score, frames = final
    if track_frames and return_carry:
        return out, score, final
    if track_frames:
        return out, score, frames
    if return_carry:
        return out, score, final[:5]
    return out, score
