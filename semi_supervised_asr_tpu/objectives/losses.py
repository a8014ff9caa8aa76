"""Objectives: masked CE (+ label smoothing), text-AE, pseudo-label terms.

Reference counterparts: SURVEY.md §3 #12 (supervised CE), #13 (text
autoencoder), #14 (pseudo-label consistency).  Everything here is pure and
composes into ONE fused jit train step (BASELINE.json:5) in
``training/train_step.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig, ObjectiveConfig
from semi_supervised_asr_tpu.data.vocab import EOS, PAD, SOS
from semi_supervised_asr_tpu.models import speller as S


def shift_targets(tokens: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[B, U] gold tokens (ending with EOS, PAD-padded) ->
    (decoder inputs [B, U] = <sos> + tokens[:-1], targets [B, U] = tokens)."""
    b = tokens.shape[0]
    sos = jnp.full((b, 1), SOS, tokens.dtype)
    inputs = jnp.concatenate([sos, tokens[:, :-1]], axis=1)
    return inputs, tokens


def token_mask(targets: jax.Array) -> jax.Array:
    """Valid positions: everything up to and INCLUDING the EOS."""
    return (targets != PAD).astype(jnp.float32)


def masked_ce(
    logits: jax.Array,        # [B, U, V]
    targets: jax.Array,       # [B, U]
    label_smoothing: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """-> (scalar mean CE over valid tokens, per-token logprob [B,U]).

    Hand-rolled (log_softmax + gather) so smoothing distributes over the
    whole vocab; verified against a direct computation in tests.
    """
    mask = token_mask(targets)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    gold_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        v = logits.shape[-1]
        smooth = jnp.mean(logp, axis=-1)  # uniform-over-vocab component
        nll = -(1.0 - label_smoothing) * gold_lp - label_smoothing * smooth
    else:
        nll = -gold_lp
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(nll * mask) / denom, gold_lp


def ctc_per_utt_nll(
    ctc_params: dict,
    enc: jax.Array,          # [B, T', 2H] encoder outputs
    enc_mask: jax.Array,     # [B, T'] bool
    tokens: jax.Array,       # [B, U] EOS-terminated, PAD-padded targets
) -> tuple[jax.Array, jax.Array]:
    """Per-utterance CTC NLL -> (nll [B], n_labels [B] fp32).

    PAD (id 0) doubles as the CTC blank — labels never contain it (EOS is
    stripped too: it is not an acoustic unit).  Rows with zero labels
    (all-PAD remainder duplicates) report n_labels == 0; callers weight
    them out.  Shared by the joint CTC-attention aux (``ctc_loss``) and
    the standalone CTC family's supervised/pseudo-label terms
    (models/ctc_model.py, train_step family branch)."""
    import optax

    from semi_supervised_asr_tpu.decode.ctc import ctc_head_logits

    logits = ctc_head_logits(ctc_params, enc)
    labels = jnp.where(tokens == EOS, PAD, tokens)
    label_pad = (labels == PAD).astype(jnp.float32)
    logit_pad = 1.0 - enc_mask.astype(jnp.float32)
    per_utt = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                             blank_id=PAD)
    return per_utt, jnp.sum(1.0 - label_pad, axis=1)


def ctc_loss(
    ctc_params: dict,
    enc: jax.Array,          # [B, T', 2H] encoder outputs
    enc_mask: jax.Array,     # [B, T'] bool
    tokens: jax.Array,       # [B, U] EOS-terminated, PAD-padded targets
) -> jax.Array:
    """CTC over the encoder (joint CTC-attention aux, Kim et al. 2017).

    Token-normalized like the attention CE; all-PAD rows (remainder
    duplicates) contribute nothing."""
    per_utt, n_labels = ctc_per_utt_nll(ctc_params, enc, enc_mask, tokens)
    live = (n_labels > 0).astype(jnp.float32)
    return jnp.sum(per_utt * live) / jnp.maximum(jnp.sum(n_labels), 1.0)


def supervised_loss(
    params: dict,
    model_cfg: ModelConfig,
    obj_cfg: ObjectiveConfig,
    feats: jax.Array,
    feat_lens: jax.Array,
    tokens: jax.Array,
    tf_rate,
    rng: jax.Array,
    train: bool = True,
    remat: bool = False,
    return_enc: bool = False,
) -> tuple[jax.Array, dict]:
    """Supervised CE on labeled (audio, text) pairs (+ optional CTC aux).

    ``return_enc``: also return (enc, enc_mask) so downstream in-step
    objectives (MWER) reuse the encoder pass instead of re-encoding."""
    from semi_supervised_asr_tpu.models import seq2seq as M

    tokens_in, targets = shift_targets(tokens)
    logits, _, enc, enc_mask = M.forward_teacher(
        params, model_cfg, feats, feat_lens, tokens_in, tf_rate, rng,
        train, remat, return_enc=True,
    )
    loss, _ = masked_ce(logits, targets, obj_cfg.label_smoothing)
    acc = token_accuracy(logits, targets)
    metrics = {"ce": loss, "acc": acc}
    if obj_cfg.lambda_ctc > 0.0:
        assert "ctc" in params, (
            "objective.lambda_ctc > 0 needs the CTC head (model.ctc_head; "
            "the Solver enables it automatically)"
        )
        aux = ctc_loss(params["ctc"], enc, enc_mask, targets)
        loss = loss + obj_cfg.lambda_ctc * aux
        metrics["ctc"] = aux
    if return_enc:
        return loss, metrics, enc, enc_mask
    return loss, metrics


def text_ae_loss(
    params: dict,
    model_cfg: ModelConfig,
    obj_cfg: ObjectiveConfig,
    text_tokens: jax.Array,   # [B, U] unlabeled TEXT
) -> jax.Array:
    """Text autoencoder: reconstruct unlabeled text through the shared
    speller (embedding/LSTM/projection are the SAME arrays as the ASR
    decoder — weight sharing by construction)."""
    tokens_in, targets = shift_targets(text_tokens)
    logits = S.text_autoencoder_logits(
        params["speller"], model_cfg, tokens_in
    )
    loss, _ = masked_ce(logits, targets, obj_cfg.label_smoothing)
    return loss


def pseudo_label_loss(
    params: dict,
    teacher_params: dict,
    model_cfg: ModelConfig,
    obj_cfg: ObjectiveConfig,
    feats_clean: jax.Array,
    feats_aug: jax.Array,
    feat_lens: jax.Array,
    rng: jax.Array,
    max_len: int,
    row_mask: jax.Array | None = None,
) -> jax.Array:
    """Pseudo-label consistency on unlabeled AUDIO (SURVEY.md §4.2).

    The teacher (EMA or current params, stop-gradient either way) greedily
    decodes the CLEAN view inside the step — a ``lax.scan``, never a host
    round-trip; the student is trained with CE on the AUGMENTED view
    against those pseudo-labels.  ``pseudo_confidence`` is an ABSOLUTE
    probability threshold in (0, 1): utterances whose mean per-token
    teacher probability (exp of mean hyp logprob) falls below it are
    masked out; 0 keeps everything.  It is NOT a keep-quantile — the kept
    fraction varies with teacher quality (experiments/README.md tunes it).
    """
    from semi_supervised_asr_tpu.decode.greedy import greedy_decode_from_enc
    from semi_supervised_asr_tpu.models import seq2seq as M

    teacher = jax.lax.stop_gradient(teacher_params)
    enc, enc_mask, keys = M.encode(teacher, feats_clean, feat_lens, model_cfg)
    hyps, hyp_logp = greedy_decode_from_enc(
        teacher["speller"], model_cfg, enc, enc_mask, keys, max_len
    )
    hyps = jax.lax.stop_gradient(hyps)

    tokens_in, targets = shift_targets(hyps)
    logits, _ = M.forward_teacher(
        params, model_cfg, feats_aug, feat_lens, tokens_in,
        tf_rate=1.0, rng=rng, train=True,
    )
    mask = token_mask(targets)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    gold_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    nll = -gold_lp * mask

    # confidence filter: mean teacher logprob per utterance
    utt_len = jnp.maximum(jnp.sum(mask, axis=1), 1.0)
    conf = jnp.sum(hyp_logp * mask, axis=1) / utt_len
    keep = (conf >= jnp.log(jnp.maximum(obj_cfg.pseudo_confidence, 1e-8))
            if obj_cfg.pseudo_confidence > 0.0
            else jnp.ones_like(conf, bool))
    if row_mask is not None:
        keep = keep & row_mask  # drop remainder-duplicate rows
    keep_f = keep.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(mask * keep_f[:, None]), 1.0)
    return jnp.sum(nll * keep_f[:, None]) / denom


def expected_risk(
    seq_logp: jax.Array,    # [B, K] total log-prob of each n-best hyp
    risks: jax.Array,       # [B, K] per-hyp risk (e.g. edit distance)
    row_weight: jax.Array,  # [B] 1.0 for live rows, 0.0 for padding rows
) -> tuple[jax.Array, jax.Array]:
    """MWER expected risk (Prabhavalkar et al. 2018, arXiv:1712.01818).

    -> (scalar loss, mean risk metric).  ``loss = E_{p̂}[risk - mean risk]``
    with p̂ the n-best-renormalized sequence posteriors; subtracting the
    uniform n-best mean is the paper's variance reduction and makes the
    all-hyps-equal case exactly zero.  Gradients flow only through
    ``seq_logp``.
    """
    p = jax.nn.softmax(seq_logp.astype(jnp.float32), axis=-1)
    risks = jax.lax.stop_gradient(risks.astype(jnp.float32))
    baseline = jnp.mean(risks, axis=-1, keepdims=True)
    per_row = jnp.sum(p * (risks - baseline), axis=-1)
    denom = jnp.maximum(jnp.sum(row_weight), 1.0)
    loss = jnp.sum(per_row * row_weight) / denom
    mean_risk = jnp.sum(jnp.sum(p * risks, axis=-1) * row_weight) / denom
    return loss, mean_risk


def mwer_loss(
    params: dict,
    model_cfg: ModelConfig,
    obj_cfg: ObjectiveConfig,
    feats: jax.Array,
    feat_lens: jax.Array,
    tokens: jax.Array,     # [B, U] gold (EOS-terminated, PAD-padded)
    remat: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Standalone MWER entry (encodes internally); the fused train step
    uses :func:`mwer_loss_from_enc` to reuse the supervised CE pass's
    encoder states."""
    from semi_supervised_asr_tpu.models import seq2seq as M

    enc, enc_mask, _ = M.encode(
        params, feats, feat_lens, model_cfg, remat=remat
    )
    return mwer_loss_from_enc(params, model_cfg, obj_cfg, enc, enc_mask,
                              tokens)


def mwer_loss_from_enc(
    params: dict,
    model_cfg: ModelConfig,
    obj_cfg: ObjectiveConfig,
    enc: jax.Array,        # [B, T', enc_out] (typically the CE pass's)
    enc_mask: jax.Array,   # [B, T']
    tokens: jax.Array,     # [B, U] gold (EOS-terminated, PAD-padded)
) -> tuple[jax.Array, jax.Array]:
    """Minimum-WER sequence training, entirely inside the jit step.

    The batched jit beam (decode/beam.py) proposes K n-best hypotheses
    (discrete — no gradient path), each is teacher-force re-scored by the
    model (differentiable), risks are jit edit distances
    (ops/edit_distance.py) against the gold tokens, and the loss is the
    n-best expected risk.  Reference counterpart: none (reference trains
    CE only); this is a capability extension in the reference's model
    family, standard for production LAS (arXiv:1712.01818).
    """
    from semi_supervised_asr_tpu.config import DecodeConfig
    from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
    from semi_supervised_asr_tpu.ops.edit_distance import (
        batched_edit_distance,
    )

    b, u = tokens.shape
    k = obj_cfg.mwer_beam
    dcfg = DecodeConfig(beam_size=k, length_penalty=1.0)

    keys = S.precompute_decode_cache(params["speller"], model_cfg, enc)
    nbest, _ = beam_decode_from_enc(
        params["speller"], model_cfg, dcfg, enc, enc_mask, keys,
        max_len=u, return_nbest=True,
    )                                               # [B, K, U] int
    nbest = jax.lax.stop_gradient(nbest)

    # differentiable re-scoring: one batched teacher-forced pass over B*K
    flat = nbest.reshape(b * k, u)
    tokens_in, targets = shift_targets(flat)
    logits, _ = S.forward_teacher(
        params["speller"], model_cfg,
        jnp.repeat(enc, k, axis=0), jnp.repeat(enc_mask, k, axis=0),
        tokens_in, tf_rate=1.0, rng=None, train=False,
    )
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    gold_lp = jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    seq_logp = jnp.sum(gold_lp * token_mask(targets), axis=1).reshape(b, k)

    # risks: edit distance on content tokens (EOS is not an error unit)
    hyp_c = jnp.where(nbest == EOS, PAD, nbest)
    ref_c = jnp.where(tokens == EOS, PAD, tokens)
    hyp_lens = jnp.sum(hyp_c != PAD, axis=-1)
    ref_lens = jnp.sum(ref_c != PAD, axis=-1)
    risks = batched_edit_distance(
        hyp_c, hyp_lens,
        jnp.broadcast_to(ref_c[:, None, :], (b, k, u)),
        jnp.broadcast_to(ref_lens[:, None], (b, k)),
    )
    row_weight = (ref_lens > 0).astype(jnp.float32)  # drop all-PAD rows
    return expected_risk(seq_logp, risks, row_weight)


def token_accuracy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    mask = token_mask(targets)
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == targets).astype(jnp.float32) * mask
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1.0)
