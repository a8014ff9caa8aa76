"""Semi-supervised objectives for the transducer family.

The framework's headline capability (SURVEY.md §1.1 #4: supervised CE
plus unlabeled text-AE / pseudo-label terms) re-expressed for RNN-T —
the LAS terms need the attention speller, these need only the
predictor/joint:

* **Pseudo-label consistency** (unlabeled AUDIO, ``lambda_pseudo``):
  the teacher (EMA or current params, stop-gradient either way) decodes
  the CLEAN view with the in-step frame-synchronous greedy — a
  ``lax.scan``, never a host round-trip — and the student is trained
  with the transducer lattice NLL on the AUGMENTED (SpecAugment) view
  against those pseudo-labels.  The direct RNN-T analog of the LAS term
  (objectives/losses.pseudo_label_loss); noisy-student training for
  transducers is standard practice (Park et al. 2020, arXiv:2005.09629).

* **Internal-LM text loss** (unlabeled TEXT, ``lambda_text_ae``): the
  transducer's analog of the LAS text autoencoder.  The predictor +
  joint-with-zeroed-acoustics IS the model's internal language model
  (Variani et al. 2020 HAT, arXiv:2003.07705; Meng et al. 2021 ILMT,
  arXiv:2102.01380): ``softmax_{v != blank}(W_out tanh(W_pred g(y_<u) +
  b))``.  Training it with next-label CE on unlabeled text regularizes
  the label-space prior exactly where the LAS term regularizes the
  speller — no new parameters, gradients reach only the predictor and
  the joint's pred-side weights (the listener and ``w_enc`` are
  untouched, which tests assert).

Both terms reuse the ObjectiveConfig knobs (warmup gate, confidence
threshold, EMA teacher) with the same semantics as the LAS versions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig, ObjectiveConfig
from semi_supervised_asr_tpu.data.vocab import PAD


def pseudo_label_loss(
    params: dict,
    teacher_params: dict,
    model_cfg: ModelConfig,
    obj_cfg: ObjectiveConfig,
    feats_clean: jax.Array,
    feats_aug: jax.Array,
    feat_lens: jax.Array,
    dropout_rng: jax.Array,
    max_u: int,
    row_mask: jax.Array | None = None,
    max_symbols: int = 4,
) -> jax.Array:
    """Teacher greedy on clean -> student lattice NLL on augmented.

    ``pseudo_confidence`` is an ABSOLUTE probability threshold in (0,1)
    on the teacher's mean per-step path probability — the transducer
    path covers T' blanks + U emissions, so the mean is over
    ``enc_len + label_len`` steps; 0 keeps everything.
    """
    from semi_supervised_asr_tpu.decode.transducer_greedy import (
        transducer_greedy_from_enc,
    )
    from semi_supervised_asr_tpu.models import transducer as TD
    from semi_supervised_asr_tpu.objectives.transducer_loss import (
        transducer_loss,
    )

    teacher = jax.lax.stop_gradient(teacher_params)
    enc_t, mask_t = TD.encode(teacher, feats_clean, feat_lens, model_cfg)
    hyps, path_lp = transducer_greedy_from_enc(
        teacher, model_cfg, enc_t, mask_t, max_u, max_symbols=max_symbols
    )
    hyps = jax.lax.stop_gradient(hyps)
    label_lens = jnp.sum(hyps != PAD, axis=1).astype(jnp.int32)

    enc_s, mask_s = TD.encode(
        params, feats_aug, feat_lens, model_cfg, train=True,
        dropout_rng=dropout_rng,
    )
    pred = TD.predictor_train(params["predictor"], hyps, model_cfg)
    enc_lens = jnp.maximum(jnp.sum(mask_s, axis=1), 1).astype(jnp.int32)
    if model_cfg.joint_chunk_frames > 0:
        from semi_supervised_asr_tpu.objectives.transducer_loss import (
            transducer_loss_from_parts,
        )

        blank_lp, emit_lp = TD.joint_lattice_terms(
            params["joint"], enc_s, pred, hyps, model_cfg, blank=PAD,
            chunk_frames=model_cfg.joint_chunk_frames,
        )
        _, nll = transducer_loss_from_parts(
            blank_lp, emit_lp, enc_lens, label_lens
        )
    else:
        logits = TD.joint_logits(params["joint"], enc_s, pred, model_cfg)
        _, nll = transducer_loss(
            logits, enc_lens, hyps, label_lens, blank=PAD
        )

    # confidence filter: mean per-step teacher path probability
    t_lens = jnp.sum(mask_t, axis=1).astype(jnp.float32)
    steps = jnp.maximum(t_lens + label_lens.astype(jnp.float32), 1.0)
    conf = path_lp / steps                       # mean log-prob per step
    keep = (conf >= jnp.log(jnp.maximum(obj_cfg.pseudo_confidence, 1e-8))
            if obj_cfg.pseudo_confidence > 0.0
            else jnp.ones_like(conf, bool))
    # empty pseudo-labels carry no training signal (all-blank lattice)
    keep = keep & (label_lens > 0)
    if row_mask is not None:
        keep = keep & row_mask                   # remainder-duplicate rows
    keep_f = keep.astype(jnp.float32)
    # per-label normalization, like the supervised transducer branch
    denom = jnp.maximum(
        jnp.sum((label_lens.astype(jnp.float32) + 1.0) * keep_f), 1.0
    )
    return jnp.sum(nll * keep_f) / denom


def ilm_logits(params: dict, pred: jax.Array) -> jax.Array:
    """Internal-LM logits from predictor states [B, U1, P] -> [B, U1, V].

    The joint with the acoustic term zeroed (HAT/ILMT estimation):
    ``tanh(pred @ w_pred + b) @ w_out + b_out``.
    """
    hp = jnp.einsum(
        "bup,pj->buj", pred.astype(jnp.float32),
        params["w_pred"].astype(jnp.float32),
    )
    h = jnp.tanh(hp + params["b"].astype(jnp.float32))
    return jnp.einsum(
        "buj,jv->buv", h, params["w_out"].astype(jnp.float32),
    ) + params["b_out"].astype(jnp.float32)


def ilm_text_loss(
    params: dict, model_cfg: ModelConfig, text: jax.Array
) -> jax.Array:
    """Next-label CE of the internal LM on unlabeled text [B, U].

    ``text`` rows are EOS-terminated and PAD-padded (the same unlabeled-
    text batches the LAS text-AE consumes); the transducer emits no EOS
    (blank terminates paths), so the EOS is masked out of the targets
    and the blank column is excluded from the ILM softmax.
    """
    from semi_supervised_asr_tpu.models import transducer as TD

    # label count excludes the EOS terminator (supervised-branch rule)
    label_lens = jnp.maximum(
        jnp.sum(text != PAD, axis=1) - 1, 0
    ).astype(jnp.int32)
    pred = TD.predictor_train(params["predictor"], text, model_cfg)
    logits = ilm_logits(params["joint"], pred)[:, :-1, :]   # rows 0..U-1
    # blank is an alignment symbol, not a label — exclude it from the
    # ILM distribution (HAT convention)
    logits = logits.at[..., PAD].set(-1e30)
    logp = jax.nn.log_softmax(logits, axis=-1)
    gold = jnp.take_along_axis(logp, text[..., None], axis=-1)[..., 0]
    u = text.shape[1]
    mask = (jnp.arange(u)[None, :] < label_lens[:, None]).astype(
        jnp.float32
    )
    return -jnp.sum(gold * mask) / jnp.maximum(jnp.sum(mask), 1.0)
