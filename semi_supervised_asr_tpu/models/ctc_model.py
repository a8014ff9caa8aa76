"""CTC model family (``model.family: ctc``).

The third decoding paradigm beside LAS and the RNN-T transducer: an
encoder-only model (Graves et al. 2006) — the listener (any
architecture behind ``seq2seq._listener_fns``) plus ONE linear
projection to per-frame label posteriors, with the blank as the
non-emission symbol.  No decoder network at all: the per-frame label
distributions are conditionally independent given the encoder output,
which is what makes the family the cheapest to train and decode — one
matmul past the encoder, frame-synchronous by construction.

* **Head**: the SAME ``{"w", "b"}`` projection the LAS family's joint
  CTC-attention aux uses (``decode/ctc.ctc_head_logits``) — when the
  family is ``ctc`` the head IS the model, so ``objective.lambda_ctc``
  must stay 0 (asserted in training/train_step.make_train_step).
* **Blank id = PAD (0)** — the repo-wide convention shared with the
  transducer family and the CTC aux loss; labels never contain PAD,
  and EOS is stripped (it is not an acoustic unit).
* **Loss**: ``objectives/losses.ctc_per_utt_nll`` (optax's CTC
  forward DP), token-normalized in the fused step like the other
  families.
* **Decode**: best-path greedy (``decode/ctc.ctc_greedy_from_enc``)
  and the batched jit prefix beam search with shallow LM fusion
  (``decode/ctc_beam.py``).

Reference counterpart: none — the reference is attention-LAS only
(SURVEY.md §3); capability extension like the transducer family,
``las`` stays the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig


def init_ctc_model(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32):
    from semi_supervised_asr_tpu.models.seq2seq import _listener_fns

    k_enc, k_head = jax.random.split(key)
    enc_init, _ = _listener_fns(cfg)
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "listener": enc_init(k_enc, cfg, dtype),
        "ctc": {
            "w": glorot(k_head, (cfg.enc_out_dim, cfg.vocab_size), dtype),
            "b": jnp.zeros((cfg.vocab_size,), dtype),
        },
    }


def encode(
    params: dict,
    feats: jax.Array,
    feat_lens: jax.Array,
    cfg: ModelConfig,
    train: bool = False,
    dropout_rng: jax.Array | None = None,
    remat: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """-> (enc [B, T', enc_out_dim] fp32, enc_mask [B, T'])."""
    from semi_supervised_asr_tpu.models.seq2seq import _listener_fns

    _, apply = _listener_fns(cfg)
    if remat:
        apply = jax.checkpoint(apply, static_argnums=(3, 4), policy=None)
    enc, enc_lens = apply(
        params["listener"], feats, feat_lens, cfg, train, dropout_rng
    )
    t = enc.shape[1]
    return enc, jnp.arange(t)[None, :] < enc_lens[:, None]
