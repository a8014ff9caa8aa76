"""Batched jit CTC prefix beam search (Hannun et al. 2014, arXiv:1408.2873).

Frame-synchronous, fixed width: all hypotheses consume encoder frames
in lockstep, so the whole beam is dense [B, K] tensor state — one
compile, gather-reorders instead of per-hypothesis Python dicts, the
same TPU shape as the LAS and transducer beams.

Prefix beam search is NOT best-path search: each beam row tracks a
LABEL PREFIX with two probabilities — ``pb`` (paths ending in blank)
and ``pnb`` (paths ending in the prefix's last label) — so alignments
that collapse to the same labeling pool their mass, which best-path
greedy cannot do.  Per frame, each live prefix contributes:

* a STAY candidate (consume blank, or repeat its last label into the
  same labeling): ``pb' = (pb ⊕ pnb) + lp[blank]``,
  ``pnb' = pnb + lp[last]`` (⊕ = logaddexp);
* V-1 EXTEND candidates ℓ+v:
  ``mass = lp[v] + (v == last ? pb : pb ⊕ pnb)`` — the repeated-label
  case must cross a blank, hence only ``pb``.

**Exact prefix merging**: when a beam row ℓ⁺ equals another row ℓ
extended by v, that extension's mass is logaddexp-merged into ℓ⁺'s
STAY candidate and removed from the extend pool — exactly Hannun's
dict update restricted to the beam's prefixes (rows hold DISTINCT
prefixes by construction: stays of distinct prefixes stay distinct,
extensions of distinct prefixes by one label are distinct, and the
stay/extend collisions are the merged ones).  With K at least the
number of reachable prefixes the search is therefore EXACT marginal
decoding — tested against brute-force enumeration; at practical K the
pruned search is pinned by a pure-Python dict oracle.

Shallow LM fusion (``lm_weight`` > 0): ranking score =
``log P_ctc(prefix) + lm_weight * log P_lm(prefix)``; the LM term
advances only on label EXTENSIONS (blanks/repeats are alignment, not
labels) — per-hypothesis LM state gather-reorders with the beam, both
LM archs work (the transformer LM KV cache tracks per-row positions).
No EOS/length term: CTC prefixes carry no EOS and all candidates at a
given frame have consumed the same audio.

``carry``/``return_carry``: resume/export the frame-scan state so
chunked streaming decode is the SAME computation as the full-utterance
scan (decode/streaming.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.data.vocab import PAD, SOS

NEG_INF = -1e30


def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mx = jnp.maximum(mx, NEG_INF)            # keep -inf - -inf finite
    return mx + jnp.log1p(jnp.exp(jnp.minimum(a, b) - mx))


def ctc_beam_from_enc(
    ctc_params: dict,
    enc: jax.Array,          # [B, T', enc_out_dim]
    enc_mask: jax.Array,     # [B, T'] bool
    max_u: int,
    beam_size: int = 4,
    blank: int = PAD,
    lm_params: dict | None = None,
    lm_step_fn=None,
    lm_weight: float = 0.0,
    return_nbest: bool = False,
    carry: tuple | None = None,
    return_carry: bool = False,
    bias=None,
):
    """-> (tokens [B, max_u] PAD-padded — labels never contain PAD, so
    no EOS terminator is needed (the transducer-family convention; an
    EOS marker would be ambiguous since EOS's id is a legal CTC label
    class), score [B]); ``return_nbest``: ([B, K, max_u], [B, K])
    sorted by score.

    ``score`` is the ranking total: the prefix's CTC log-marginal
    (``pb ⊕ pnb``, ALL alignments pooled) plus ``lm_weight * log
    P_lm(prefix)`` when fusing, plus the contextual-biasing total when
    ``bias`` (a :class:`~.biasing.BiasTrie`) is given — the bias rides
    each prefix like the LM score (advancing only on label EXTENSIONS)
    and the final ranking subtracts each prefix's PENDING (uncompleted-
    phrase) bonus, so only completed hotwords keep their boost while the
    transient bonus still protects partial matches from in-scan pruning.
    Biasing composes with LM fusion and with streaming: when ``bias`` is
    given, the ``carry`` grows two trailing slots (trie node + running
    bias score) so chunked decode resumes the walk exactly (pass the
    same trie every chunk)."""
    from semi_supervised_asr_tpu.decode.ctc import ctc_head_logits

    b, t, _ = enc.shape
    k = beam_size
    logp = jax.nn.log_softmax(ctc_head_logits(ctc_params, enc), axis=-1)
    v = logp.shape[-1]
    use_lm = (lm_params is not None and lm_step_fn is not None
              and lm_weight > 0.0)
    use_bias = bias is not None
    if use_bias:
        from semi_supervised_asr_tpu.decode import biasing as BZ
    if use_lm and "blocks" in lm_params:
        t_cache = lm_params["pos"].shape[0]
        assert max_u < t_cache, (
            f"CTC beam with a transformer LM: max_u {max_u} must stay "
            f"below lm.max_len {t_cache} (KV-cache depth; hypotheses "
            "advance the LM once per emitted label)"
        )

    def flat(x):
        return x.reshape((b * k,) + x.shape[2:])

    def unflat(x):
        return x.reshape((b, k) + x.shape[1:])

    bias_node = jnp.zeros((b, k), jnp.int32) if use_bias else None
    bias_score = jnp.zeros((b, k)) if use_bias else None
    if carry is not None and use_bias:
        (toks, count, last, pb, pnb, lm_score, lm_state, lm_lp,
         bias_node, bias_score) = carry
    elif carry is not None:
        toks, count, last, pb, pnb, lm_score, lm_state, lm_lp = carry
    else:
        toks = jnp.full((b, k, max_u), PAD, jnp.int32)
        count = jnp.zeros((b, k), jnp.int32)
        last = jnp.full((b, k), blank, jnp.int32)   # empty prefix: no label
        # only row 0 is live: the empty prefix, all mass on "ends in blank"
        pb = jnp.full((b, k), NEG_INF).at[:, 0].set(0.0)
        pnb = jnp.full((b, k), NEG_INF)
        lm_score = jnp.zeros((b, k))
        if use_lm:
            lm_state = lm_step_fn(
                lm_params, None, None, init_batch=b * k
            )[0]
            lm_state, lm_logits = lm_step_fn(
                lm_params, lm_state, jnp.full((b * k,), SOS, jnp.int32)
            )
            lm_lp = unflat(jax.nn.log_softmax(
                lm_logits.astype(jnp.float32), axis=-1
            ))                                      # [B, K, V]
        else:
            lm_state, lm_lp = None, None

    def gather_k(x, idx):
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
        c = jnp.broadcast_to(cond, (b, k)).reshape(
            (1, b * k) + (1,) * (new.ndim - 2)
        )
        return jnp.where(c, new, old)

    def frame(st, inp):
        (toks, count, last, pb, pnb, lm_score, lm_state, lm_lp,
         bias_node, bias_score) = st
        lp, valid_t = inp                           # [B, V], [B]
        live = pb > NEG_INF / 2
        live = live | (pnb > NEG_INF / 2)
        tot = _logaddexp(pb, pnb)                   # [B, K] AM marginal

        # ---- stay: blank transition + last-label repeat ----
        pb_stay = tot + lp[:, None, blank]
        lp_last = jnp.take_along_axis(lp[:, None, :].repeat(k, 1),
                                      last[..., None], axis=2)[..., 0]
        pnb_stay = jnp.where(count > 0, pnb + lp_last, NEG_INF)

        # ---- extend: mass for prefix_k + v ----
        la = jnp.where(
            jnp.arange(v)[None, None, :] == last[..., None],
            pb[..., None], tot[..., None],
        )                                           # [B, K, V] base mass
        ext = lp[:, None, :] + la                   # [B, K, V]

        # ---- exact prefix merge (Hannun's dict update, in-beam) ----
        # parent[b, j, kk]: row j == row kk extended by last[j]
        pos = jnp.arange(max_u)[None, None, None, :]
        eq = toks[:, :, None, :] == toks[:, None, :, :]   # [B, J, K, U]
        prefix_eq = jnp.all(eq | (pos >= count[:, None, :, None]), axis=-1)
        parent = (
            prefix_eq
            & (count[:, :, None] == count[:, None, :] + 1)
            & live[:, :, None] & live[:, None, :]
        )                                           # [B, J, K]
        # merged mass into row j's stay: ext[kk, last[j]] for its parent
        ext_at_lastj = jnp.take_along_axis(
            ext[:, None, :, :].repeat(k, 1),        # [B, J, K, V]
            last[:, :, None, None].repeat(k, 2), axis=3,
        )[..., 0]                                   # [B, J, K]
        merged = jnp.max(
            jnp.where(parent, ext_at_lastj, NEG_INF), axis=2
        )                                           # <=1 parent per row
        pnb_stay = _logaddexp(pnb_stay, merged)
        # remove merged candidates from the extend pool (no double count)
        onehot_last = (
            jnp.arange(v)[None, None, :] == last[..., None]
        )                                           # [B, J, V]
        remove = jnp.any(
            parent[..., None] & onehot_last[:, :, None, :], axis=1
        )                                           # [B, K, V]

        # ---- ranking totals ----
        stay_total = jnp.where(
            live, _logaddexp(pb_stay, pnb_stay) + lm_weight * lm_score,
            NEG_INF,
        )
        ext_total = ext + lm_weight * lm_score[..., None]
        if use_lm:
            ext_total = ext_total + lm_weight * lm_lp
        if use_bias:
            # running bias rides every candidate (stays keep it; extends
            # add the trie delta for the new label — blank/repeat are
            # alignment moves, the trie walks LABELS only)
            bias_ext = BZ.bias_delta(bias, flat(bias_node)).reshape(
                b, k, v
            )
            stay_total = jnp.where(live, stay_total + bias_score, stay_total)
            ext_total = ext_total + bias_score[..., None] + bias_ext
        ext_total = jnp.where(
            live[..., None] & ~remove & (count[..., None] < max_u),
            ext_total, NEG_INF,
        )
        ext_total = ext_total.at[..., blank].set(NEG_INF)

        pool = jnp.concatenate(
            [stay_total, ext_total.reshape(b, k * v)], axis=1
        )
        top_scores, top_idx = jax.lax.top_k(pool, k)
        is_ext = top_idx >= k
        src = jnp.where(is_ext, (top_idx - k) // v, top_idx)
        tok = jnp.where(is_ext, (top_idx - k) % v, blank).astype(jnp.int32)

        toks_g = gather_k(toks, src)
        count_g = gather_k(count, src)
        last_g = jnp.take_along_axis(last, src, axis=1)
        pb_g = jnp.take_along_axis(pb_stay, src, axis=1)
        pnb_g = jnp.take_along_axis(pnb_stay, src, axis=1)
        lm_score_g = jnp.take_along_axis(lm_score, src, axis=1)
        ext_mass_g = jnp.take_along_axis(
            gather_k(ext, src), tok[..., None], axis=2
        )[..., 0]

        toks_n = jnp.where(
            (jnp.arange(max_u)[None, None, :] == count_g[..., None])
            & is_ext[..., None],
            tok[..., None], toks_g,
        )
        count_n = count_g + is_ext.astype(jnp.int32)
        last_n = jnp.where(is_ext, tok, last_g)
        pb_n = jnp.where(is_ext, NEG_INF, pb_g)
        pnb_n = jnp.where(is_ext, ext_mass_g, pnb_g)

        if use_bias:
            node_g = jnp.take_along_axis(bias_node, src, axis=1)
            bsc_g = jnp.take_along_axis(bias_score, src, axis=1)
            bias_tok = jnp.take_along_axis(
                gather_k(bias_ext, src), tok[..., None], axis=2
            )[..., 0]
            bias_score_n = jnp.where(is_ext, bsc_g + bias_tok, bsc_g)
            node_adv = BZ.bias_advance(
                bias, flat(node_g), flat(tok)
            ).reshape(b, k)
            bias_node_n = jnp.where(is_ext, node_adv, node_g)
        else:
            bias_score_n, bias_node_n = bias_score, bias_node

        if use_lm:
            lm_lp_tok = jnp.take_along_axis(
                gather_k(lm_lp, src), tok[..., None], axis=2
            )[..., 0]
            lm_score_n = jnp.where(
                is_ext, lm_score_g + lm_lp_tok, lm_score_g
            )
            lm_state_g = jax.tree.map(
                lambda x: gather_rows(x, src), lm_state
            )
            new_lm_state, new_lm_logits = lm_step_fn(
                lm_params, lm_state_g, flat(tok)
            )
            lm_lp_g = gather_k(lm_lp, src)
            lm_lp_n = jnp.where(
                is_ext[..., None],
                unflat(jax.nn.log_softmax(
                    new_lm_logits.astype(jnp.float32), axis=-1
                )),
                lm_lp_g,
            )
            lm_state_n = jax.tree.map(
                lambda nx, ox: where_rows(is_ext, nx, ox),
                new_lm_state, lm_state_g,
            )
        else:
            lm_score_n, lm_state_n, lm_lp_n = lm_score, lm_state, lm_lp

        upd = valid_t[:, None]
        upd3 = upd[..., None]
        toks = jnp.where(upd3, toks_n, toks)
        count = jnp.where(upd, count_n, count)
        last = jnp.where(upd, last_n, last)
        pb = jnp.where(upd, pb_n, pb)
        pnb = jnp.where(upd, pnb_n, pnb)
        if use_lm:
            lm_score = jnp.where(upd, lm_score_n, lm_score)
            lm_lp = jnp.where(upd3, lm_lp_n, lm_lp)
            lm_state = jax.tree.map(
                lambda nx, ox: where_rows(upd, nx, ox),
                lm_state_n, lm_state,
            )
        if use_bias:
            bias_node = jnp.where(upd, bias_node_n, bias_node)
            bias_score = jnp.where(upd, bias_score_n, bias_score)
        return (toks, count, last, pb, pnb, lm_score, lm_state, lm_lp,
                bias_node, bias_score), None

    final, _ = jax.lax.scan(
        frame,
        (toks, count, last, pb, pnb, lm_score, lm_state, lm_lp,
         bias_node, bias_score),
        (logp.swapaxes(0, 1), enc_mask.swapaxes(0, 1)),
    )
    toks, count, last, pb, pnb, lm_score, _, _, bias_node, bias_score = final
    if not use_bias:
        final = final[:8]   # unbiased streaming-carry contract: 8 slots
    # (biased: the carry keeps the two bias slots so chunked streaming
    # resumes the trie walk — lattice/LM slots are in the same positions)
    scores = _logaddexp(pb, pnb) + lm_weight * lm_score
    if use_bias:
        # completed phrases keep their boost; a prefix still mid-phrase
        # at the last frame gives the transient bonus back
        scores = scores + bias_score - BZ.bias_pending(
            bias, flat(bias_node)
        ).reshape(b, k)

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
        order_scores, order = jax.lax.top_k(scores, k)
        ordered = jnp.take_along_axis(
            toks, order[:, :, None].repeat(max_u, 2), axis=1,
        )
        return ordered, order_scores
    best = jnp.argmax(scores, axis=1)
    best_toks = jnp.take_along_axis(
        toks, best[:, None, None], axis=1
    )[:, 0]
    best_score = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return best_toks, best_score
