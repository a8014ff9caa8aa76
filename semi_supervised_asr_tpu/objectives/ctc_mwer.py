"""MWER (minimum word error rate / MBR) sequence training for CTC.

The CTC analog of objectives/losses.mwer_loss_from_enc and
transducer_mwer.py (arXiv:1712.01818; Prabhavalkar et al. 2018 apply it
across attention and CTC-like models): the jit prefix beam proposes K
n-best label sequences (discrete — no gradient path), each hypothesis
is re-scored by its DIFFERENTIABLE CTC log-marginal (all alignments
pooled — the same quantity the prefix beam tracks, but now as a
function of the live head/encoder), risks are jit edit distances
against the gold labels, and the loss is the n-best expected
(risk − mean risk) under the renormalized sequence posteriors.

Enabled by the same knobs as the other families:
``objective.lambda_mwer``, ``mwer_beam``, ``mwer_warmup_steps`` — the
fused step wires it behind the identical ``lax.cond`` warmup gate.

Cost: one K-wide prefix-beam frame scan plus B*K CTC forward DPs on
the CE pass's encoder (no second encode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig, ObjectiveConfig
from semi_supervised_asr_tpu.data.vocab import EOS, PAD

NEG_INF = -1e30


def mwer_loss_from_enc(
    params: dict,
    model_cfg: ModelConfig,
    obj_cfg: ObjectiveConfig,
    enc: jax.Array,        # [B, T', E] (the supervised pass's encoder)
    enc_mask: jax.Array,   # [B, T']
    tokens: jax.Array,     # [B, U] gold (EOS-terminated, PAD-padded)
) -> tuple[jax.Array, jax.Array]:
    """-> (expected-risk loss, mean n-best risk metric)."""
    import optax

    from semi_supervised_asr_tpu.decode.ctc import ctc_head_logits
    from semi_supervised_asr_tpu.decode.ctc_beam import ctc_beam_from_enc
    from semi_supervised_asr_tpu.objectives.losses import expected_risk
    from semi_supervised_asr_tpu.ops.edit_distance import (
        batched_edit_distance,
    )

    b, u = tokens.shape
    k = obj_cfg.mwer_beam
    nbest, beam_scores = ctc_beam_from_enc(
        params["ctc"], enc, enc_mask, u, beam_size=k, return_nbest=True,
    )                                               # [B, K, U] int
    nbest = jax.lax.stop_gradient(nbest)
    live = jax.lax.stop_gradient(beam_scores) > NEG_INF / 2   # [B, K]

    # differentiable re-scoring: each hypothesis's CTC log-marginal on
    # the live head (labels are PAD-padded trailing — feed optax
    # directly, no EOS mapping: beam rows never contain PAD mid-row)
    logits = ctc_head_logits(params["ctc"], enc)     # [B, T', V]
    flat = nbest.reshape(b * k, u)
    logits_rep = jnp.repeat(logits, k, axis=0)
    logit_pad = jnp.repeat(1.0 - enc_mask.astype(jnp.float32), k, axis=0)
    label_pad = (flat == PAD).astype(jnp.float32)
    nll = optax.ctc_loss(logits_rep, logit_pad, flat, label_pad,
                         blank_id=PAD)
    # empty hypotheses: their marginal is the all-blank path product
    # (optax's DP is not defined at zero labels)
    logp = jax.nn.log_softmax(logits, axis=-1)
    empty_lp = jnp.sum(
        logp[..., PAD] * enc_mask.astype(jnp.float32), axis=-1
    )                                                # [B]
    n_labels = jnp.sum(flat != PAD, axis=1).reshape(b, k)
    seq_logp = jnp.where(
        n_labels > 0, (-nll).reshape(b, k), empty_lp[:, None]
    )
    # dead beam rows (fewer than K reachable prefixes) leave the
    # posterior renormalization
    seq_logp = jnp.where(live, seq_logp, NEG_INF)

    # risks: label edit distance (hyps carry no EOS terminator; strip
    # the gold's so it is not an error unit)
    ref_c = jnp.where(tokens == EOS, PAD, tokens)
    ref_lens = jnp.sum(ref_c != PAD, axis=-1)
    hyp_lens = jnp.sum(nbest != PAD, axis=-1)
    risks = batched_edit_distance(
        nbest, hyp_lens,
        jnp.broadcast_to(ref_c[:, None, :], (b, k, u)),
        jnp.broadcast_to(ref_lens[:, None], (b, k)),
    )
    row_weight = (ref_lens > 0).astype(jnp.float32)  # drop all-PAD rows
    return expected_risk(seq_logp, risks, row_weight)
