"""CTC greedy decoding from the encoder CTC head (joint CTC-attention).

Best-path decode: per-frame argmax -> collapse repeats -> drop blanks
(PAD doubles as the blank, matching objectives/losses.ctc_loss).  Output
rows are formatted like the attention decoders — tokens then EOS then
PADs — so scoring and hypothesis records work unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.data.vocab import EOS, PAD


def ctc_head_logits(ctc_params: dict, enc: jax.Array) -> jax.Array:
    """Encoder CTC head: [B, T', 2H] -> fp32 logits [B, T', V].

    The single definition shared by the training loss, greedy CTC decode,
    and beam rescoring (consistency by construction)."""
    return (
        jnp.einsum("bte,ev->btv", enc, ctc_params["w"].astype(jnp.float32),
                   preferred_element_type=jnp.float32)
        + ctc_params["b"].astype(jnp.float32)
    )


def ctc_greedy_from_enc(
    ctc_params: dict,
    enc: jax.Array,        # [B, T', 2H]
    enc_mask: jax.Array,   # [B, T'] bool
) -> tuple[jax.Array, jax.Array]:
    """-> (tokens [B, T'] EOS-terminated PAD-padded, frame logp [B])."""
    logits = ctc_head_logits(ctc_params, enc)
    logp = jax.nn.log_softmax(logits, axis=-1)
    path = jnp.argmax(logits, axis=-1)                   # [B, T']
    path = jnp.where(enc_mask, path, PAD)
    best_lp = jnp.sum(
        jnp.max(logp, axis=-1) * enc_mask.astype(jnp.float32), axis=-1
    )

    # collapse repeats: keep a frame only if it differs from its
    # predecessor; then drop blanks — all static-shape via a stable
    # "compaction by sort" (valid tokens keyed by position, invalid
    # pushed to the end)
    b, t = path.shape
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, path.dtype), path[:, :-1]], axis=1
    )
    keep = (path != PAD) & (path != prev)
    pos = jnp.arange(t)[None, :]
    key = jnp.where(keep, pos, t + pos)                  # stable partition
    order = jnp.argsort(key, axis=1)
    compacted = jnp.take_along_axis(jnp.where(keep, path, PAD), order,
                                    axis=1)
    n_out = jnp.sum(keep, axis=1)                        # [B]
    # terminate with EOS at position n_out (t column exists: n_out <= t)
    widened = jnp.concatenate(
        [compacted, jnp.full((b, 1), PAD, path.dtype)], axis=1
    )
    out = jnp.where(
        jnp.arange(t + 1)[None, :] == n_out[:, None], EOS, widened
    )
    return out[:, : t], best_lp


def ctc_greedy_stream_init(b: int, max_u: int,
                           track_frames: bool = False,
                           bias: bool = False) -> tuple:
    """Carry for ``ctc_greedy_stream``: (prev path id, tokens, count,
    score).  prev starts at PAD — the collapse never keeps a PAD frame,
    so a real first token is never suppressed.  With ``track_frames``
    the carry gains a slot: each token's first occupied frame (-1 until
    written) — streaming timestamps.  With ``bias`` it gains two
    TRAILING slots — the automaton state and the running bias score
    (committed + pending, the ctc_beam convention) — so biased chunked
    greedy resumes the trie walk exactly."""
    base = (
        jnp.zeros((b,), jnp.int32),
        jnp.full((b, max_u), PAD, jnp.int32),
        jnp.zeros((b,), jnp.int32),
        jnp.zeros((b,), jnp.float32),
    )
    if track_frames:
        base = base + (jnp.full((b, max_u), -1, jnp.int32),)
    if bias:
        base = base + (jnp.zeros((b,), jnp.int32),
                       jnp.zeros((b,), jnp.float32))
    return base


def ctc_greedy_stream(
    ctc_params: dict,
    enc: jax.Array,        # [B, T', enc_out_dim] (a chunk is fine)
    enc_mask: jax.Array,   # [B, T'] bool
    max_u: int,
    carry: tuple,
    frame_base: jax.Array | int = 0,
    bias=None,
) -> tuple:
    """Best-path greedy as a resumable frame scan -> new carry.

    The same collapse as ``ctc_greedy_from_enc`` expressed as a scan
    whose carry crosses chunk boundaries (the previous chunk's last
    path id decides whether the next chunk's first frame is a repeat),
    so chunked decoding IS the full-utterance decode
    (decode/streaming.py; equality tested in tests/test_ctc_stream.py).
    Emits at most ``max_u`` tokens (the batch variant is uncapped — its
    output rows are frame-width).

    A 5-tuple ``carry`` (ctc_greedy_stream_init ``track_frames=True``)
    additionally records each kept token's first path frame at
    ``frame_base`` + its chunk-local index (pass encoder frames already
    consumed so frames stay ABSOLUTE across chunks) — the best-path
    emission time, serving streaming timestamps.  Token/score slots are
    bitwise unaffected.

    ``bias`` (a biasing.BiasTrie, with the matching two-slot carry from
    ``ctc_greedy_stream_init(bias=True)``): greedy shallow-fusion
    hotword boosting — each frame's path decision argmaxes over
    ``logp + delta`` where ``delta`` is the automaton's per-token score
    adjustment on EMITTING columns (blank and repeat columns stay 0:
    no emission, no automaton transition).  The ``score`` slot keeps the
    pure model log-prob of the chosen path; the bias-score slot
    accumulates the deltas of emitted tokens (committed + pending), and
    the caller's final correction subtracts ``bias_pending(node)`` —
    exactly the ctc_beam accounting at K=1.  Chunked == offline by the
    same carry argument as the unbiased scan."""
    logits = ctc_head_logits(ctc_params, enc)
    logp = jax.nn.log_softmax(logits, axis=-1)
    n_bias = 2 if bias is not None else 0
    track = len(carry) == 5 + n_bias
    assert len(carry) == 4 + (1 if track else 0) + n_bias, (
        "carry arity does not match (track_frames, bias) — build it "
        "with ctc_greedy_stream_init(track_frames=..., bias=...)"
    )
    if bias is not None:
        from semi_supervised_asr_tpu.decode import biasing as BZ

        def frame(c, inp):
            node, bsc = c[-2:]
            (prev, out, count, score), frames = c[:4], (
                c[4] if track else None
            )
            lp, valid, t_idx = inp                    # [B, V], [B], []
            v = lp.shape[1]
            delta = BZ.bias_delta(bias, node)         # [B, V]
            cols = jnp.arange(v, dtype=jnp.int32)[None, :]
            no_emit = (cols == PAD) | (cols == prev[:, None])
            eff = jnp.where(no_emit, 0.0, delta)
            p = jnp.argmax(lp + eff, axis=-1).astype(jnp.int32)
            lp_p = jnp.take_along_axis(lp, p[:, None], axis=1)[:, 0]
            d_p = jnp.take_along_axis(eff, p[:, None], axis=1)[:, 0]
            emit = valid & (p != PAD) & (p != prev) & (count < max_u)
            slot = (jnp.arange(out.shape[1])[None, :] == count[:, None]) \
                & emit[:, None]
            out = jnp.where(slot, p[:, None], out)
            if track:
                frames = jnp.where(slot, t_idx, frames)
            count = count + emit.astype(jnp.int32)
            prev = jnp.where(valid, p, prev)
            score = score + jnp.where(valid, lp_p, 0.0)
            bsc = bsc + jnp.where(emit, d_p, 0.0)
            node = jnp.where(
                emit, BZ.bias_advance(bias, node, p), node
            )
            c = (prev, out, count, score) \
                + ((frames,) if track else ()) + (node, bsc)
            return c, None

        t = enc.shape[1]
        carry, _ = jax.lax.scan(
            frame, carry,
            (logp.swapaxes(0, 1), enc_mask.swapaxes(0, 1),
             jnp.arange(t, dtype=jnp.int32) + jnp.asarray(frame_base,
                                                          jnp.int32)),
        )
        return carry

    path = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, T']
    lp_max = jnp.max(logp, axis=-1)                       # [B, T']

    def frame(c, inp):
        if track:
            prev, out, count, score, frames = c
        else:
            prev, out, count, score = c
        p, lp, valid, t_idx = inp
        emit = valid & (p != PAD) & (p != prev) & (count < max_u)
        slot = (jnp.arange(out.shape[1])[None, :] == count[:, None]) \
            & emit[:, None]
        out = jnp.where(slot, p[:, None], out)
        if track:
            frames = jnp.where(slot, t_idx, frames)
        count = count + emit.astype(jnp.int32)
        prev = jnp.where(valid, p, prev)
        score = score + jnp.where(valid, lp, 0.0)
        c = (prev, out, count, score) + ((frames,) if track else ())
        return c, None

    t = enc.shape[1]
    carry, _ = jax.lax.scan(
        frame, carry,
        (path.swapaxes(0, 1), lp_max.swapaxes(0, 1),
         enc_mask.swapaxes(0, 1),
         jnp.arange(t, dtype=jnp.int32) + jnp.asarray(frame_base,
                                                      jnp.int32)),
    )
    return carry
