"""Semi-supervised objective for the CTC family.

**Pseudo-label consistency** (unlabeled AUDIO, ``lambda_pseudo``): the
teacher (EMA or current params, stop-gradient either way) best-path
decodes the CLEAN view in-step — a single argmax+collapse past the
encoder, never a host round-trip — and the student is trained with the
CTC NLL on the AUGMENTED (SpecAugment) view against those
pseudo-labels.  The direct CTC analog of the LAS and transducer terms
(objectives/losses.pseudo_label_loss, transducer_semi.py); CTC
noisy-student self-training is standard practice (Park et al. 2020,
arXiv:2005.09629; Xu et al. 2020 iterative pseudo-labeling).

There is NO text term: CTC has no decoder/predictor — the model's
per-frame outputs are conditionally independent given the audio, so
there is no internal label-space prior for unlabeled text to train
(that is the family's defining trade).  Unlabeled text is instead used
by training an external LM (training/lm_trainer.py) and fusing it at
decode time (decode/ctc_beam.py shallow fusion) —
``objective.lambda_text_ae`` is asserted 0 for this family
(training/train_step.make_train_step).

Shares the ObjectiveConfig knobs (warmup gate, confidence threshold,
EMA teacher) with the same semantics as the other families.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig, ObjectiveConfig
from semi_supervised_asr_tpu.data.vocab import PAD


def ctc_pseudo_label_loss(
    params: dict,
    teacher_params: dict,
    model_cfg: ModelConfig,
    obj_cfg: ObjectiveConfig,
    feats_clean: jax.Array,
    feats_aug: jax.Array,
    feat_lens: jax.Array,
    dropout_rng: jax.Array | None = None,
    row_mask: jax.Array | None = None,
) -> jax.Array:
    """Teacher best-path greedy on clean -> student CTC NLL on augmented.

    ``pseudo_confidence`` is an ABSOLUTE probability threshold in (0,1)
    on the teacher's mean per-FRAME best-path probability (the greedy
    score covers every valid encoder frame, blanks included); 0 keeps
    everything.
    """
    from semi_supervised_asr_tpu.decode.ctc import ctc_greedy_from_enc
    from semi_supervised_asr_tpu.models import ctc_model as CM
    from semi_supervised_asr_tpu.objectives.losses import ctc_per_utt_nll

    teacher = jax.lax.stop_gradient(teacher_params)
    enc_t, mask_t = CM.encode(teacher, feats_clean, feat_lens, model_cfg)
    hyps, path_lp = ctc_greedy_from_enc(teacher["ctc"], enc_t, mask_t)
    hyps = jax.lax.stop_gradient(hyps)
    # hyps rows are tokens..EOS..PAD; the EOS terminator is not a label
    n_labels = jnp.maximum(
        jnp.sum(hyps != PAD, axis=1) - 1, 0
    ).astype(jnp.float32)

    enc_s, mask_s = CM.encode(
        params, feats_aug, feat_lens, model_cfg, train=True,
        dropout_rng=dropout_rng,
    )
    nll, _ = ctc_per_utt_nll(params["ctc"], enc_s, mask_s, hyps)

    # confidence filter: mean per-frame teacher best-path probability
    t_lens = jnp.maximum(jnp.sum(mask_t, axis=1), 1).astype(jnp.float32)
    conf = path_lp / t_lens                      # mean log-prob per frame
    keep = (conf >= jnp.log(jnp.maximum(obj_cfg.pseudo_confidence, 1e-8))
            if obj_cfg.pseudo_confidence > 0.0
            else jnp.ones_like(conf, bool))
    # empty pseudo-labels carry no training signal; a CTC NLL against
    # them would just push every frame to blank
    keep = keep & (n_labels > 0)
    if row_mask is not None:
        keep = keep & row_mask                   # remainder-duplicate rows
    keep_f = keep.astype(jnp.float32)
    return jnp.sum(nll * keep_f) / jnp.maximum(
        jnp.sum(n_labels * keep_f), 1.0
    )
