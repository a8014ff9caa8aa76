"""Batched jit RNN-T beam search (alignment-synchronous, fixed width).

Every hypothesis consumes encoder frames in lockstep (frame-synchronous,
like the greedy decode), so the whole beam is dense [B, K] tensor state
— one compile, gather-reorders instead of per-hypothesis Python, the
same TPU shape as the LAS beam (decode/beam.py).  Within a frame each
hypothesis may emit up to ``max_symbols`` labels; after each emission
round the K best of {frozen hypotheses} ∪ {emit expansions} survive
(a K + K*V top-k).  A frame ends by force-adding the blank log-prob to
any hypothesis that never froze.  Complete paths all contain exactly
T' blanks, so raw scores are comparable without length normalization.

Shallow LM fusion (``lm_weight`` > 0): label emissions additionally
score ``lm_weight * log P_lm(token | prefix)``; blank transitions carry
no LM term (the LM models the label sequence, not the alignment) — the
standard RNN-T fusion rule.  Per-hypothesis LM state reorders with the
beam; both LM archs work (the transformer LM's KV cache tracks PER-ROW
positions — models/lm.py transformer_lm_step — because hypotheses emit
different label counts per frame).  ``ilm_weight`` > 0 additionally
SUBTRACTS the model's internal LM (predictor + zeroed-acoustics joint,
objectives/transducer_semi.ilm_logits) from label emissions — the
HAT/density-ratio correction (arXiv:2003.07705): the external LM should
replace, not stack on, the prior the predictor already encodes.

Known (documented) simplification vs. lattice-exact search: equal-prefix
hypotheses reached along different alignments are NOT merged — the
standard trade of vectorized transducer beams; K=1 reduces exactly to
the greedy decode (tested).  Like any pruned beam, there is no
per-utterance guarantee of beating greedy: the greedy alignment can be
evicted mid-search by prefixes that later decay (observed on random
models and verified against the explicit-list oracle); on average the
beam scores strictly better (tested statistically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.data.vocab import PAD, SOS
from semi_supervised_asr_tpu.models import transducer as TD

NEG_INF = -1e30


def transducer_beam_from_enc(
    params: dict,
    cfg: ModelConfig,
    enc: jax.Array,          # [B, T', 2H]
    enc_mask: jax.Array,     # [B, T']
    max_u: int,
    beam_size: int = 4,
    max_symbols: int = 4,
    blank: int = PAD,
    lm_params: dict | None = None,
    lm_step_fn=None,
    lm_weight: float = 0.0,
    ilm_weight: float = 0.0,
    return_nbest: bool = False,
    carry: tuple | None = None,
    return_carry: bool = False,
    bias=None,
) -> tuple[jax.Array, jax.Array]:
    """-> (tokens [B, max_u] PAD-padded best hypothesis, score [B]);
    ``return_nbest``: ([B, K, max_u], [B, K]) all hypotheses sorted by
    score, best first.

    ``carry``/``return_carry``: resume/export the frame-scan state
    (hypothesis lattice + predictor/LM states) so chunked streaming
    beam decode is the SAME computation as the full-utterance scan
    (decode/streaming.py; exactness tested).  Note the best hypothesis
    may change between chunks — only the final result is stable.

    ``bias``: contextual hotword boosting (:mod:`~.biasing`) on label
    EMISSIONS only (blank is alignment, not a label); each hypothesis's
    trie node gather-reorders with the beam and the final ranking
    retracts pending (uncompleted-phrase) bonuses.  Streaming composes:
    with ``bias`` the ``carry`` grows a trailing trie-node slot (the
    carried scores stay UN-retracted so the walk resumes exactly; only
    the returned ranking scores subtract pending)."""
    b, t, _ = enc.shape
    k = beam_size
    v = cfg.vocab_size
    use_lm = lm_params is not None and lm_step_fn is not None and lm_weight > 0.0
    use_bias = bias is not None
    if use_bias:
        from semi_supervised_asr_tpu.decode import biasing as BZ
    bias_node = jnp.zeros((b, k), jnp.int32) if use_bias else None
    if use_lm and "blocks" in lm_params:
        t_cache = lm_params["pos"].shape[0]
        assert max_u < t_cache, (
            f"transducer beam with a transformer LM: max_u {max_u} "
            f"must stay below lm.max_len {t_cache} (KV-cache depth; "
            "hypotheses advance the LM once per emitted label)"
        )

    def flat(x):                       # [B, K, ...] -> [B*K, ...]
        return x.reshape((b * k,) + x.shape[2:])

    def unflat(x):
        return x.reshape((b, k) + x.shape[1:])

    if carry is not None and use_bias:
        pred, state, toks, count, scores, lm_state, lm_lp, bias_node = carry
    elif carry is not None:
        pred, state, toks, count, scores, lm_state, lm_lp = carry
    else:
        pred0, state0 = TD.predictor_step(
            params["predictor"], jnp.full((b * k,), SOS, jnp.int32),
            TD.predictor_init_state(cfg, b * k), cfg,
        )
        pred = unflat(pred0)                               # [B, K, P]
        state = tuple((unflat(h), unflat(c)) for h, c in state0)
        toks = jnp.full((b, k, max_u), blank, jnp.int32)
        count = jnp.zeros((b, k), jnp.int32)
        # only hyp 0 is live at the start — K copies of the empty prefix
        # would fill the beam with duplicates
        scores = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)

        if use_lm:
            # LM state leaves carry the row axis at dim 1 ([L, B*K, H] /
            # [1, B*K]) — the models/lm.py beam contract (decode/beam.py)
            lm_state = lm_step_fn(
                lm_params, None, None, init_batch=b * k
            )[0]
            lm_state, lm_logits = lm_step_fn(
                lm_params, lm_state, jnp.full((b * k,), SOS, jnp.int32)
            )
            lm_lp = unflat(jax.nn.log_softmax(
                lm_logits.astype(jnp.float32), axis=-1
            ))                                             # [B, K, V]
        else:
            lm_state, lm_lp = None, None

    def gather_k(x, idx):
        """Reorder [B, K, ...] by per-batch source indices [B, K]."""
        ix = idx.reshape(idx.shape + (1,) * (x.ndim - 2))
        return jnp.take_along_axis(
            x, jnp.broadcast_to(ix, (b, k) + x.shape[2:]), axis=1
        )

    def gather_rows(x, idx):
        """Reorder a [*, B*K, ...] LM-state leaf (row axis 1) by [B, K]."""
        shape = x.shape
        xk = x.reshape(shape[:1] + (b, k) + shape[2:])
        ix = idx.reshape((1, b, k) + (1,) * (xk.ndim - 3))
        took = jnp.take_along_axis(
            xk, jnp.broadcast_to(ix, (xk.shape[0], b, k) + xk.shape[3:]),
            axis=2,
        )
        return took.reshape(shape)

    def where_rows(cond, new, old):
        """Per-row select on a [*, B*K, ...] leaf; cond is [B, K] (or
        broadcastable to it)."""
        c = jnp.broadcast_to(cond, (b, k)).reshape(
            (1, b * k) + (1,) * (new.ndim - 2)
        )
        return jnp.where(c, new, old)

    def frame(carry, inp):
        pred, state, toks, count, scores, lm_state, lm_lp, bias_node = carry
        enc_t, valid_t = inp                               # [B, 2H], [B]
        enc_tk = jnp.broadcast_to(enc_t[:, None, :], (b, k, enc_t.shape[-1]))
        can_emit = jnp.ones((b, k), bool)

        def lp_now(pred):
            logits = TD.joint_row(
                params["joint"], flat(enc_tk), flat(pred), cfg
            )
            return unflat(jax.nn.log_softmax(logits, axis=-1))  # [B,K,V]

        for _ in range(max_symbols):
            lp = lp_now(pred)
            blank_lp = lp[..., blank]
            freeze_cand = jnp.where(
                can_emit, scores + blank_lp, scores
            )                                              # [B, K]
            emit_cand = scores[..., None] + lp             # [B, K, V]
            if use_lm:
                emit_cand = emit_cand + lm_weight * lm_lp
            if ilm_weight > 0.0:
                from semi_supervised_asr_tpu.objectives.transducer_semi \
                    import ilm_logits

                il = ilm_logits(params["joint"], flat(pred)[:, None, :])
                il = il[:, 0].at[..., blank].set(-1e30)
                ilm_lp = unflat(jax.nn.log_softmax(il, axis=-1))
                emit_cand = emit_cand - ilm_weight * ilm_lp
            if use_bias:
                # hotword boost rides label emissions into the pooled
                # scores; frozen/blank candidates carry no delta
                bias_ext = BZ.bias_delta(bias, flat(bias_node)).reshape(
                    b, k, v
                )
                emit_cand = emit_cand + bias_ext
            emit_cand = jnp.where(
                can_emit[..., None] & (count[..., None] < max_u),
                emit_cand, NEG_INF,
            )
            emit_cand = emit_cand.at[..., blank].set(NEG_INF)
            pool = jnp.concatenate(
                [freeze_cand, emit_cand.reshape(b, k * v)], axis=1
            )                                              # [B, K + K*V]
            top_scores, top_idx = jax.lax.top_k(pool, k)
            is_emit = top_idx >= k
            src = jnp.where(is_emit, (top_idx - k) // v, top_idx)
            tok = jnp.where(is_emit, (top_idx - k) % v, blank).astype(
                jnp.int32)

            pred_g = gather_k(pred, src)
            state_g = tuple(
                (gather_k(h, src), gather_k(c, src)) for h, c in state
            )
            toks_g = gather_k(toks, src)
            count_g = gather_k(count, src)
            can_emit_g = jnp.take_along_axis(can_emit, src, axis=1)

            new_pred, new_state = TD.predictor_step(
                params["predictor"], flat(tok),
                tuple((flat(h), flat(c)) for h, c in state_g), cfg,
            )
            new_pred = unflat(new_pred)
            emit3 = is_emit[..., None]
            pred_n = jnp.where(emit3, new_pred, pred_g)
            state_n = tuple(
                (jnp.where(emit3, unflat(nh), h),
                 jnp.where(emit3, unflat(nc), c))
                for (nh, nc), (h, c) in zip(new_state, state_g)
            )
            toks_n = jnp.where(
                (jnp.arange(max_u)[None, None, :] == count_g[..., None])
                & emit3,
                tok[..., None], toks_g,
            )
            count_n = count_g + is_emit.astype(jnp.int32)
            can_emit_n = jnp.where(is_emit, True, can_emit_g & False)

            if use_bias:
                node_g = jnp.take_along_axis(bias_node, src, axis=1)
                node_adv = BZ.bias_advance(
                    bias, flat(node_g), flat(tok)
                ).reshape(b, k)
                bias_node_n = jnp.where(is_emit, node_adv, node_g)

            if use_lm:
                lm_state_g = jax.tree.map(
                    lambda x: gather_rows(x, src), lm_state
                )
                new_lm_state, new_lm_logits = lm_step_fn(
                    lm_params, lm_state_g, flat(tok)
                )
                lm_lp_g = gather_k(lm_lp, src)
                lm_lp_n = jnp.where(
                    emit3,
                    unflat(jax.nn.log_softmax(
                        new_lm_logits.astype(jnp.float32), axis=-1
                    )),
                    lm_lp_g,
                )
                lm_state_n = jax.tree.map(
                    lambda nx, ox: where_rows(is_emit, nx, ox),
                    new_lm_state, lm_state_g,
                )

            upd = valid_t[:, None]
            scores = jnp.where(upd, top_scores, scores)
            can_emit = jnp.where(upd, can_emit_n, can_emit)
            count = jnp.where(upd, count_n, count)
            upd3 = upd[..., None]
            pred = jnp.where(upd3, pred_n, pred)
            toks = jnp.where(upd3, toks_n, toks)
            state = tuple(
                (jnp.where(upd3, hn, h), jnp.where(upd3, cn, c))
                for (hn, cn), (h, c) in zip(state_n, state)
            )
            if use_lm:
                lm_lp = jnp.where(upd3, lm_lp_n, lm_lp)
                lm_state = jax.tree.map(
                    lambda nx, ox: where_rows(upd, nx, ox),
                    lm_state_n, lm_state,
                )
            if use_bias:
                bias_node = jnp.where(upd, bias_node_n, bias_node)

        # frame exit: force the blank onto hypotheses that never froze
        lp = lp_now(pred)
        scores = jnp.where(
            valid_t[:, None] & can_emit, scores + lp[..., blank], scores
        )
        return (pred, state, toks, count, scores, lm_state, lm_lp,
                bias_node), None

    final, _ = jax.lax.scan(
        frame,
        (pred, state, toks, count, scores, lm_state, lm_lp, bias_node),
        (enc.swapaxes(0, 1), enc_mask.swapaxes(0, 1)),
    )
    _, _, toks, count, scores, _, _, bias_node = final
    if not use_bias:
        final = final[:7]   # unbiased streaming-carry contract: 7 slots
    # (biased: the carry keeps the trie-node slot, and its score slot
    # stays UN-retracted — the next chunk resumes the walk exactly)
    if use_bias:
        # hypotheses still mid-phrase at the last frame give the
        # transient bonus back — only completed hotwords keep theirs
        scores = scores - BZ.bias_pending(bias, flat(bias_node)).reshape(
            b, k
        )
    if return_carry:
        assert not return_nbest
        best = jnp.argmax(scores, axis=1)
        best_toks = jnp.take_along_axis(
            toks, best[:, None, None], axis=1
        )[:, 0]
        best_score = jnp.take_along_axis(
            scores, best[:, None], axis=1
        )[:, 0]
        return best_toks, best_score, final
    if return_nbest:
        order_scores, order = jax.lax.top_k(scores, k)     # [B, K] desc
        return gather_k(toks, order), order_scores
    best = jnp.argmax(scores, axis=1)
    best_toks = jnp.take_along_axis(
        toks, best[:, None, None], axis=1
    )[:, 0]
    best_score = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return best_toks, best_score
