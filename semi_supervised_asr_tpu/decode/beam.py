"""Batched, jit-compiled attention beam search with cached encoder states.

Config C3 (BASELINE.json:9): the reference's per-utterance Python beam loop
becomes a [B, K] lattice advanced entirely under jit (the pattern of
arXiv:1811.04568, PAPERS.md):

* encoder outputs AND their attention key projections are computed once and
  tiled to the K lattice rows (the "cached encoder states");
* each step scores all K*V continuations with one batched ``speller_step``
  over [B*K] rows, takes top-k over the flattened K*V axis, then
  gather-reorders every decoder-state leaf (LSTM h/c, context, alignment)
  and the token history with the surviving beam indices — the classic
  stale-state trap is covered by equivalence tests vs a pure-Python beam
  (tests/test_beam.py);
* finished rows are frozen in-lattice: their only continuation is PAD at
  logprob 0, so scores are preserved until the final length-normalized
  selection;
* optional shallow LM fusion adds ``lm_weight * logp_lm`` to continuation
  scores (Toshniwal et al. 2018, arXiv:1807.10857, PAPERS.md);
* optional contextual biasing (``bias``: a :class:`~.biasing.BiasTrie`)
  adds the hotword-boosting delta to every candidate and rides each
  hypothesis's trie node through the carry like any state leaf
  (decode/biasing.py; EOS retracts a mid-phrase hypothesis's pending
  bonus via the delta's EOS column, and unfinished rows retract at the
  final selection).

Greedy is the K=1 fast path (exact equivalence tested).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from semi_supervised_asr_tpu.config import DecodeConfig, ModelConfig
from semi_supervised_asr_tpu.data.vocab import EOS, PAD, SOS
from semi_supervised_asr_tpu.models import speller as S

NEG_INF = -1e30


def _tile_rows(x: jax.Array, k: int) -> jax.Array:
    """[B, ...] -> [B*K, ...] (each row repeated K times, row-major)."""
    return jnp.repeat(x, k, axis=0)


def beam_decode_from_enc(
    speller_params: dict,
    cfg: ModelConfig,
    dcfg: DecodeConfig,
    enc: jax.Array,        # [B, T, enc_out]
    enc_mask: jax.Array,   # [B, T]
    keys: jax.Array,       # [B, T, A]
    max_len: int,
    lm_params: dict | None = None,
    lm_step_fn=None,
    ctc_params: dict | None = None,
    return_nbest: bool = False,
    bias=None,
) -> tuple[jax.Array, jax.Array]:
    """-> (best tokens [B, max_len] (EOS then PADs), best score [B]);
    with ``return_nbest``: (all K lattices [B, K, max_len] sorted by
    normalized score descending, scores [B, K]).

    ``ctc_params`` + ``dcfg.ctc_weight`` > 0: joint CTC-attention
    decoding.  Default: hypothesis-level rescoring — all K finished
    lattices are scored by the encoder CTC head (optax CTC forward
    algorithm, batched over B*K) and the final selection maximizes the
    length-normalized ``(1-w)*att + w*ctc`` total log-probability.
    ``dcfg.ctc_one_pass``: TRUE one-pass joint decoding (Watanabe 2017)
    — every beam step mixes ``w * Δ prefix-score`` into every candidate
    continuation (decode/ctc_prefix.py; the per-hypothesis CTC forward
    variables ride the carry and gather-reorder like any state leaf), so
    CTC evidence steers which prefixes survive, not just the final pick.

    ``bias``: a compiled :class:`~.biasing.BiasTrie` for contextual
    hotword boosting.  The delta enters each step's candidate scores
    unscaled; under hypothesis-level CTC RESCORING (``ctc_weight`` > 0
    without ``ctc_one_pass``) the accumulated bias consequently rides the
    attention total and is attenuated by ``(1-w)`` in the final blend —
    raise ``decode.bias_bonus`` accordingly, or use one-pass decoding."""
    b, t = enc_mask.shape
    k = dcfg.beam_size

    enc_k = _tile_rows(enc, k)
    mask_k = _tile_rows(enc_mask, k)
    # the decode cache is an array (LSTM keys) or a pytree (transformer
    # cross K/V) — row axis 0 either way
    keys_k = jax.tree.map(lambda a: _tile_rows(a, k), keys)

    state0 = S.init_state(b * k, t, cfg, mask_k, max_steps=max_len)
    scores0 = jnp.tile(
        jnp.concatenate([jnp.zeros((1,)), jnp.full((k - 1,), NEG_INF)])[None],
        (b, 1),
    )  # [B, K]: only beam 0 live at step 0 (identical rows would duplicate)
    tok0 = jnp.full((b * k,), SOS, jnp.int32)
    done0 = jnp.zeros((b, k), bool)
    hyps0 = jnp.full((b, k, max_len), PAD, jnp.int32)
    lens0 = jnp.zeros((b, k), jnp.int32)
    use_coverage = dcfg.coverage_weight != 0.0
    cum0 = jnp.zeros((b * k, t)) if use_coverage else None

    use_lm = lm_params is not None and lm_step_fn is not None
    lm_state0 = lm_step_fn(lm_params, None, None, init_batch=b * k)[0] if use_lm else None

    use_ctc = ctc_params is not None and dcfg.ctc_weight > 0.0
    one_pass = use_ctc and dcfg.ctc_one_pass
    if one_pass:
        from semi_supervised_asr_tpu.decode import ctc_prefix as CP
        from semi_supervised_asr_tpu.decode.ctc import ctc_head_logits

        w = dcfg.ctc_weight
        ctc_logp = CP.masked_ctc_logp(
            ctc_head_logits(ctc_params, enc), enc_mask
        )
        ctc_logp_k = _tile_rows(ctc_logp, k)                # [B*K, T, V]
        gn0, gb0 = CP.prefix_init(ctc_logp_k)
        psi0 = jnp.zeros((b, k))                            # log P(empty)=0
        empty0 = jnp.ones((b * k,), bool)
        ctc0 = (gn0, gb0, psi0, empty0)
    else:
        ctc0 = None

    use_bias = bias is not None
    if use_bias:
        from semi_supervised_asr_tpu.decode import biasing as BZ
    bias0 = jnp.zeros((b * k,), jnp.int32) if use_bias else None

    def gather_rows(x: jax.Array, beam_idx: jax.Array, axis: int) -> jax.Array:
        """Reorder the B*K row axis of a state leaf by per-batch beam_idx."""
        shape = x.shape
        xk = x.reshape(shape[:axis] + (b, k) + shape[axis + 1 :])
        idx = beam_idx.reshape((1,) * axis + (b, k) + (1,) * (xk.ndim - axis - 2))
        took = jnp.take_along_axis(xk, idx, axis=axis + 1)
        return took.reshape(shape)

    def step(carry, u):
        (state, tok, scores, done, hyps, lens, lm_state, cum, ctc,
         bias_state) = carry
        state_new, logits, alpha_new = S.speller_step(
            speller_params, cfg, state, tok, keys_k, enc_k, mask_k
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        vsz = logp.shape[-1]
        if use_lm:
            lm_state_new, lm_logits = lm_step_fn(lm_params, lm_state, tok)
            logp = logp + dcfg.lm_weight * jax.nn.log_softmax(
                lm_logits.astype(jnp.float32), axis=-1
            )
        else:
            lm_state_new = lm_state

        if one_pass:
            # in-beam joint scoring: every candidate's score mixes the CTC
            # prefix-score DELTA; the EOS column uses the finish score
            # (gamma_T of the parent), PAD (frozen rows' filler) stays 0
            gn, gb, psi, empty = ctc
            psi_cand, eos_sc = CP.candidate_scores(
                gn, gb, ctc_logp_k, tok, empty
            )                                            # [B*K, V], [B*K]
            delta = psi_cand - psi.reshape(b * k)[:, None]
            delta = delta.at[:, EOS].set(eos_sc - psi.reshape(b * k))
            delta = delta.at[:, PAD].set(0.0)
            logp = (1.0 - w) * logp + w * delta

        if use_bias:
            # contextual boost per candidate token; the EOS column comes
            # out as -pending (no EOS arc exists), retracting a
            # mid-phrase hypothesis's transient bonus when it finishes —
            # UNSCALED by lm/ctc weights (it is a ranking prior, not a
            # probability)
            logp = logp + BZ.bias_delta(bias, bias_state)

        logp = logp.reshape(b, k, vsz)
        # Frozen rows: only PAD continues, at zero cost.
        pad_only = jnp.full((vsz,), NEG_INF).at[PAD].set(0.0)
        logp = jnp.where(done[..., None], pad_only[None, None, :], logp)
        # Live rows must not emit PAD.
        live_block = jnp.zeros((vsz,)).at[PAD].set(NEG_INF)
        logp = jnp.where(done[..., None], logp, logp + live_block[None, None, :])

        total = scores[..., None] + logp                    # [B, K, V]
        flat = total.reshape(b, k * vsz)
        new_scores, flat_idx = lax.top_k(flat, k)           # [B, K]
        beam_idx = flat_idx // vsz                          # [B, K] source beam
        new_tok = (flat_idx % vsz).astype(jnp.int32)        # [B, K]

        # Gather-reorder every decoder-state leaf by the surviving beams.
        # Layer-stacked leaves (LSTM h/c, incl. the fusion LM's) carry the
        # lattice row on axis 1, the rest on axis 0.
        new_state = {
            name: gather_rows(
                leaf, beam_idx, 1 if name in ("h", "c", "lm_h", "lm_c") else 0
            )
            for name, leaf in state_new.items()
        }
        # LM state leaves are [L, B*K, H] stacks: the lattice row is axis 1.
        new_lm_state = (
            jax.tree.map(lambda x: gather_rows(x, beam_idx, 1), lm_state_new)
            if use_lm
            else lm_state_new
        )
        done_g = jnp.take_along_axis(done, beam_idx, axis=1)
        lens_g = jnp.take_along_axis(lens, beam_idx, axis=1)
        hyps_g = jnp.take_along_axis(hyps, beam_idx[..., None], axis=1)

        # Coverage accumulation (GNMT cp): add this step's alignment for
        # rows that were live, THEN gather by the surviving beams.
        if use_coverage:
            live = (~done).reshape(b * k, 1).astype(alpha_new.dtype)
            cum_new = cum + alpha_new * live
            cum_g = gather_rows(cum_new, beam_idx, 0)
        else:
            cum_g = cum

        emit = jnp.where(done_g, PAD, new_tok)
        hyps_new = hyps_g.at[:, :, u].set(emit)
        lens_new = jnp.where(done_g, lens_g, lens_g + 1)    # counts incl. EOS
        done_new = done_g | (new_tok == EOS)

        if one_pass:
            # gather the parents' forward variables, then advance them
            # with the chosen token; rows that were frozen or just chose
            # EOS keep the parent's (their score is final)
            gn, gb, psi, empty = ctc
            gn_g = gather_rows(gn, beam_idx, 0)
            gb_g = gather_rows(gb, beam_idx, 0)
            last_g = gather_rows(tok, beam_idx, 0)          # parents' last
            empty_g = gather_rows(empty, beam_idx, 0)
            flat_tok = new_tok.reshape(b * k)
            gn_a, gb_a = CP.advance(
                gn_g, gb_g, ctc_logp_k, last_g, empty_g, flat_tok
            )
            adv = (~done_new.reshape(b * k)) & (flat_tok != EOS)
            gn_new = jnp.where(adv[:, None], gn_a, gn_g)
            gb_new = jnp.where(adv[:, None], gb_a, gb_g)
            empty_new = empty_g & ~adv
            parent_cand = jnp.take_along_axis(
                psi_cand.reshape(b, k, vsz), beam_idx[..., None], axis=1
            )                                               # [B, K, V]
            psi_sel = jnp.take_along_axis(
                parent_cand, new_tok[..., None], axis=2
            )[..., 0]                                       # [B, K]
            psi_g = jnp.take_along_axis(psi, beam_idx, axis=1)
            psi_new = jnp.where(adv.reshape(b, k), psi_sel, psi_g)
            ctc_new = (gn_new, gb_new, psi_new, empty_new)
        else:
            ctc_new = ctc

        if use_bias:
            # trie node follows the surviving beam's chosen token; rows
            # that finished (now or earlier) freeze theirs — their score
            # is final and frozen rows' deltas are overwritten anyway
            bst_g = gather_rows(bias_state, beam_idx, 0)
            adv_b = (~done_new).reshape(b * k)
            bias_new = jnp.where(
                adv_b,
                BZ.bias_advance(bias, bst_g, new_tok.reshape(b * k)),
                bst_g,
            )
        else:
            bias_new = bias_state

        carry = (
            new_state,
            emit.reshape(b * k),
            new_scores,
            done_new,
            hyps_new,
            lens_new,
            new_lm_state,
            cum_g,
            ctc_new,
            bias_new,
        )
        return carry, None

    carry = (state0, tok0, scores0, done0, hyps0, lens0, lm_state0, cum0,
             ctc0, bias0)
    carry, _ = lax.scan(step, carry, jnp.arange(max_len))
    _, _, scores, done, hyps, lens, _, cum, _, bias_fin = carry

    if use_bias:
        # rows the step cap cut off mid-phrase never hit the EOS-column
        # retraction — neutralize their pending bonus so the no-finished
        # fallback ranking is not polluted by incomplete matches
        scores = scores - jnp.where(
            done, 0.0, BZ.bias_pending(bias, bias_fin).reshape(b, k)
        )

    if use_ctc and not one_pass:
        import optax

        from semi_supervised_asr_tpu.decode.ctc import ctc_head_logits

        ctc_logits = ctc_head_logits(ctc_params, enc)   # [B, T, V]
        logit_pad = 1.0 - enc_mask.astype(jnp.float32)
        labels = jnp.where(hyps == EOS, PAD, hyps)      # [B, K, U] no EOS
        label_pad = (labels == PAD).astype(jnp.float32)

        # vmap the label-dependent forward pass over the K beams instead
        # of tiling the [B, T, V] logits K-fold (decode-time memory)
        def per_beam(lab, pad):
            return optax.ctc_loss(ctc_logits, logit_pad, lab, pad,
                                  blank_id=PAD)

        ctc_lp = -jax.vmap(per_beam, in_axes=(1, 1), out_axes=1)(
            labels, label_pad
        )                                               # [B, K] total logp
        w = dcfg.ctc_weight
        scores = (1.0 - w) * scores + w * ctc_lp

    # Length-normalized final selection; unfinished hyps are penalized so a
    # finished one wins whenever any exists.
    norm_raw = (
        scores / jnp.maximum(lens.astype(jnp.float32), 1.0) ** dcfg.length_penalty
    )
    if use_coverage:
        # GNMT coverage penalty: beta * sum_t log(min(cum_t, 1)) over valid
        # frames, floored to keep never-attended frames finite.
        capped = jnp.clip(cum.reshape(b, k, t), jnp.exp(-10.0), 1.0)
        cov = jnp.sum(
            jnp.log(capped) * enc_mask[:, None, :].astype(capped.dtype),
            axis=-1,
        )
        norm_raw = norm_raw + dcfg.coverage_weight * cov
    any_done = jnp.any(done, axis=1, keepdims=True)
    # If NO beam finished (pathological), fall back to raw normalized score.
    norm = jnp.where(done | ~any_done, norm_raw, NEG_INF)
    if return_nbest:
        order = jnp.argsort(-norm, axis=1)                  # [B, K]
        nbest = jnp.take_along_axis(hyps, order[..., None], axis=1)
        nscores = jnp.take_along_axis(norm, order, axis=1)
        return nbest, nscores
    best = jnp.argmax(norm, axis=1)                         # [B]
    best_hyp = jnp.take_along_axis(hyps, best[:, None, None], axis=1)[:, 0]
    best_norm = jnp.take_along_axis(norm, best[:, None], axis=1)[:, 0]
    return best_hyp, best_norm


@partial(jax.jit, static_argnames=("cfg", "dcfg", "max_len"))
def beam_decode(
    params: dict,
    cfg: ModelConfig,
    dcfg: DecodeConfig,
    feats: jax.Array,
    feat_lens: jax.Array,
    max_len: int,
    bias=None,
):
    """Full jit beam pass from features (one compile per bucket shape)."""
    from semi_supervised_asr_tpu.models import seq2seq as M

    enc, enc_mask, keys = M.encode(params, feats, feat_lens, cfg)
    return beam_decode_from_enc(
        params["speller"], cfg, dcfg, enc, enc_mask, keys, max_len,
        bias=bias,
    )
