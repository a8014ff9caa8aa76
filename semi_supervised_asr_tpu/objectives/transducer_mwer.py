"""MWER (minimum word error rate / MBR) sequence training for RNN-T.

The transducer analog of objectives/losses.mwer_loss_from_enc
(arXiv:1712.01818, standard for production transducers — e.g.
arXiv:2007.13802 "MWER training for attention and RNN-T"): the
alignment-synchronous jit beam proposes K n-best label sequences
(discrete — no gradient path), each hypothesis is re-scored by the
DIFFERENTIABLE lattice NLL (its full marginal over alignments, not the
beam's single-alignment search score), risks are jit edit distances
against the gold labels, and the loss is the n-best expected
(risk − mean risk) under the renormalized sequence posteriors.

Enabled by the same knobs as the LAS version: ``objective.lambda_mwer``,
``mwer_beam``, ``mwer_warmup_steps`` — the fused step wires it behind
the identical ``lax.cond`` warmup gate (training/train_step.py).

Cost: K beam passes over the frame scan plus B*K lattice evaluations;
``model.joint_chunk_frames`` bounds the rescoring grids' memory exactly
as it does the supervised loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig, ObjectiveConfig
from semi_supervised_asr_tpu.data.vocab import EOS, PAD


def mwer_loss_from_enc(
    params: dict,
    model_cfg: ModelConfig,
    obj_cfg: ObjectiveConfig,
    enc: jax.Array,        # [B, T', E] (the supervised pass's encoder)
    enc_mask: jax.Array,   # [B, T']
    tokens: jax.Array,     # [B, U] gold (EOS-terminated, PAD-padded)
    max_symbols: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """-> (expected-risk loss, mean n-best risk metric)."""
    from semi_supervised_asr_tpu.decode.transducer_beam import (
        transducer_beam_from_enc,
    )
    from semi_supervised_asr_tpu.models import transducer as TD
    from semi_supervised_asr_tpu.objectives.losses import expected_risk
    from semi_supervised_asr_tpu.objectives.transducer_loss import (
        transducer_loss, transducer_loss_from_parts,
    )
    from semi_supervised_asr_tpu.ops.edit_distance import (
        batched_edit_distance,
    )

    b, u = tokens.shape
    k = obj_cfg.mwer_beam
    nbest, _ = transducer_beam_from_enc(
        params, model_cfg, enc, enc_mask, u, beam_size=k,
        max_symbols=max_symbols, return_nbest=True,
    )                                               # [B, K, U] int
    nbest = jax.lax.stop_gradient(nbest)

    # differentiable re-scoring: the lattice NLL of each hypothesis
    # (B*K lattices on the repeated encoder)
    flat = nbest.reshape(b * k, u)
    label_lens = jnp.sum(flat != PAD, axis=1).astype(jnp.int32)
    enc_rep = jnp.repeat(enc, k, axis=0)
    mask_rep = jnp.repeat(enc_mask, k, axis=0)
    enc_lens = jnp.maximum(jnp.sum(mask_rep, axis=1), 1).astype(jnp.int32)
    pred = TD.predictor_train(params["predictor"], flat, model_cfg)
    if model_cfg.joint_chunk_frames > 0:
        bl, em = TD.joint_lattice_terms(
            params["joint"], enc_rep, pred, flat, model_cfg, blank=PAD,
            chunk_frames=model_cfg.joint_chunk_frames,
        )
        _, nll = transducer_loss_from_parts(bl, em, enc_lens, label_lens)
    else:
        logits = TD.joint_logits(params["joint"], enc_rep, pred, model_cfg)
        _, nll = transducer_loss(
            logits, enc_lens, flat, label_lens, blank=PAD
        )
    seq_logp = (-nll).reshape(b, k)

    # risks: label edit distance (transducer hyps carry no EOS; strip
    # the gold's terminator so it is not an error unit)
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
