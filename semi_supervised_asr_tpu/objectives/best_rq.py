"""BEST-RQ self-supervised encoder pretraining (Chiu et al. 2022,
arXiv:2202.01855): masked speech prediction with a frozen
random-projection quantizer.

The reference stack regularizes with unlabeled data through the decoder
(text autoencoder) and through pseudo-labels (SURVEY.md §3 #13/#14);
BEST-RQ adds the third leg — *encoder* pretraining on unlabeled AUDIO
alone — as a separate stage whose listener weights any model family
(LAS / transducer / CTC, any encoder arch) can start from
(``train.init_encoder_from``).

Mechanism (all MXU-friendly — this is why BEST-RQ fits TPUs better than
contrastive or VQ-learned targets):

1. **Targets** come from the CLEAN features: stack ``r = time_reduction``
   consecutive CMVN'd log-mel frames (matching the listener's output
   rate), project through a FROZEN random matrix, and label each stacked
   frame with the nearest (cosine) row of a FROZEN random codebook.  The
   quantizer is never trained — it is regenerated from
   ``pretrain.quantizer_seed`` and folded into the jit graph as
   constants, so there is nothing to checkpoint and no way to collapse.
2. **Inputs** are the same features with random contiguous spans
   replaced by Gaussian noise (mask_prob per-frame span starts, dilated
   to ``mask_span`` frames).
3. **Loss**: a linear head on the encoder output predicts the codebook
   index at every *masked* output position; cross-entropy is averaged
   over masked, in-length, real positions only.

Everything here is pure jit-able functions; the driver lives in
``training/pretrain.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import ModelConfig, PretrainConfig


def make_quantizer(
    n_mels: int, time_reduction: int, pcfg: PretrainConfig
) -> tuple[np.ndarray, np.ndarray]:
    """Frozen (projection [r*n_mels, dim], codebook [size, dim]).

    Deterministic in ``pretrain.quantizer_seed`` alone — regenerated
    identically at every step/restart, so targets are stable across the
    whole pretraining run without storing the matrices anywhere.
    Codebook rows are L2-normalized once; with the projected vectors
    normalized in-graph, nearest-by-L2 equals argmax cosine.
    """
    rng = np.random.default_rng(pcfg.quantizer_seed)
    d_in = time_reduction * n_mels
    proj = rng.standard_normal((d_in, pcfg.codebook_dim)) / np.sqrt(d_in)
    cb = rng.standard_normal((pcfg.codebook_size, pcfg.codebook_dim))
    cb /= np.linalg.norm(cb, axis=-1, keepdims=True)
    return proj.astype(np.float32), cb.astype(np.float32)


def bestrq_targets(
    feats: jax.Array,      # [B, T, M] clean CMVN'd log-mel, zeros on pad
    proj: jax.Array,       # [r*M, c]
    codebook: jax.Array,   # [V_cb, c], rows unit-norm
    time_reduction: int,
) -> jax.Array:
    """-> [B, T/r] int32 codebook indices at the encoder output rate."""
    b, t, m = feats.shape
    assert t % time_reduction == 0, (t, time_reduction)
    stacked = feats.reshape(b, t // time_reduction, time_reduction * m)
    z = stacked.astype(jnp.float32) @ proj
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
    return jnp.argmax(z @ codebook.T, axis=-1).astype(jnp.int32)


def dilate_spans(starts: jax.Array, span: int) -> jax.Array:
    """[B, T] bool span-start indicators -> positions covered by any span
    of ``span`` frames beginning at a start (start inclusive, extending
    forward).  Static unrolled ORs — ``span`` is a compile-time constant
    and XLA fuses the chain."""
    mask = starts
    for k in range(1, span):
        mask = jnp.logical_or(
            mask, jnp.pad(starts, ((0, 0), (k, 0)))[:, : starts.shape[1]]
        )
    return mask


def sample_mask(
    rng: jax.Array,
    b: int,
    t: int,
    feat_lens: jax.Array,  # [B]
    pcfg: PretrainConfig,
) -> jax.Array:
    """[B, T] bool — BEST-RQ masking: Bernoulli(mask_prob) span starts on
    valid frames, each dilated to ``mask_span`` frames (spans may run past
    a start but never into the pad region).

    Every real utterance gets AT LEAST one span: one extra start is
    forced at a uniform valid position (at recipe-scale T the Bernoulli
    draw makes this a near-no-op, but at short T a zero-span draw would
    otherwise waste the whole utterance — loss and grads exactly 0).
    ``mask_prob == 0`` disables masking entirely (no forced span)."""
    valid = jnp.arange(t)[None, :] < feat_lens[:, None]
    r_bern, r_pos = jax.random.split(rng)
    starts = jax.random.bernoulli(r_bern, pcfg.mask_prob, (b, t)) & valid
    if pcfg.mask_prob > 0:
        pos = jax.random.randint(
            r_pos, (b,), 0, jnp.maximum(feat_lens, 1)
        )
        # rows with feat_lens == 0 force position 0, which the final
        # ``& valid`` clears again — pad-only rows stay empty
        starts = starts | jax.nn.one_hot(pos, t, dtype=bool)
    return dilate_spans(starts, pcfg.mask_span) & valid


def masked_inputs(
    rng: jax.Array,
    feats: jax.Array,      # [B, T, M]
    mask: jax.Array,       # [B, T] bool
    pcfg: PretrainConfig,
) -> jax.Array:
    """Replace masked frames with N(0, mask_noise_std) noise (the features
    are CMVN'd, so 0-mean noise sits at the feature scale)."""
    noise = pcfg.mask_noise_std * jax.random.normal(
        rng, feats.shape, feats.dtype
    )
    return jnp.where(mask[..., None], noise, feats)


def prediction_ce(
    logits: jax.Array,     # [B, T', V_cb] float32
    labels: jax.Array,     # [B, T'] int32
    pos_mask: jax.Array,   # [B, T'] bool — positions that count
) -> tuple[jax.Array, dict]:
    """Mean CE over ``pos_mask`` positions (+ metrics).  Positions outside
    the mask contribute EXACTLY nothing — tests flip their labels and
    assert bitwise-equal loss."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    n = jnp.maximum(jnp.sum(pos_mask), 1)
    loss = jnp.sum(jnp.where(pos_mask, nll, 0.0)) / n
    pred = jnp.argmax(logits, axis=-1)
    acc = jnp.sum(jnp.where(pos_mask, pred == labels, False)) / n
    # codebook utilization: fraction of codes the TARGETS hit in this
    # batch (a collapsed quantizer would be impossible — frozen — but a
    # too-small codebook_dim shows up here)
    v = logits.shape[-1]
    hit = jnp.zeros((v,), jnp.float32).at[
        jnp.where(pos_mask, labels, 0).reshape(-1)
    ].add(jnp.where(pos_mask, 1.0, 0.0).reshape(-1))
    used = jnp.sum(hit > 0) / v
    return loss, {"mask_acc": acc, "codes_used": used,
                  "masked_positions": n.astype(jnp.float32)}


def init_bestrq_head(
    key: jax.Array, mcfg: ModelConfig, pcfg: PretrainConfig,
    dtype=jnp.float32,
) -> dict:
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "w": glorot(key, (mcfg.enc_out_dim, pcfg.codebook_size), dtype),
        "b": jnp.zeros((pcfg.codebook_size,), dtype),
    }


def bestrq_loss(
    params: dict,          # {"listener": ..., "head": {w, b}}
    mcfg: ModelConfig,
    pcfg: PretrainConfig,
    feats: jax.Array,      # [B, T, M] clean CMVN'd features (pad zeros)
    feat_lens: jax.Array,  # [B]
    real: jax.Array,       # [B] bool
    rng: jax.Array,
    proj: jax.Array,
    codebook: jax.Array,
) -> tuple[jax.Array, dict]:
    """One masked-prediction loss over a featurized batch.

    The encoder runs through the SAME ``_listener_fns`` dispatch training
    uses — Pallas LSTM backends, conv stems, and attention listeners all
    pretrain through their production code paths.
    """
    from semi_supervised_asr_tpu.models.seq2seq import _listener_fns

    r = mcfg.time_reduction
    b, t, _ = feats.shape
    labels = bestrq_targets(feats, proj, codebook, r)

    k_mask, k_noise, k_drop = jax.random.split(rng, 3)
    mask = sample_mask(k_mask, b, t, feat_lens, pcfg)
    x = masked_inputs(k_noise, feats, mask, pcfg)

    _, apply = _listener_fns(mcfg)
    enc, enc_lens = apply(
        params["listener"], x, feat_lens, mcfg,
        train=True, dropout_rng=k_drop,
    )
    head = params["head"]
    logits = enc.astype(jnp.float32) @ head["w"].astype(jnp.float32) \
        + head["b"].astype(jnp.float32)

    # an output position is supervised iff ANY of its r input frames was
    # masked, it is within the (reduced) length, and the row is real
    pos_masked = mask.reshape(b, t // r, r).any(axis=-1)
    t_out = enc.shape[1]
    pos_masked = pos_masked[:, :t_out]
    valid = jnp.arange(t_out)[None, :] < enc_lens[:, None]
    pos = pos_masked & valid & real[:, None]
    loss, metrics = prediction_ce(logits, labels[:, :t_out], pos)
    metrics["mask_frac"] = jnp.sum(mask) / jnp.maximum(
        jnp.sum(feat_lens), 1
    )
    return loss, metrics
