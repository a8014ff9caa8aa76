"""Seq2seq wrapper tying Listener + Speller (SURVEY.md §3 #11).

Public surface mirrors the reference's model object:
* ``init_model(key, cfg)`` -> param pytree,
* ``encode(params, feats, lens, cfg)`` -> cached encoder states,
* ``forward_teacher(params, cfg, batch, ...)`` -> logits for CE,
decode lives in ``semi_supervised_asr_tpu.decode`` (greedy/beam reuse the
same ``speller_step``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.models import listener as L
from semi_supervised_asr_tpu.models import speller as S
from semi_supervised_asr_tpu.models import attention as A


def _listener_fns(cfg: ModelConfig):
    """(init, apply) for the configured encoder architecture."""
    assert cfg.enc_bidirectional or cfg.encoder_arch == "blstm", (
        "model.enc_bidirectional=false (streaming encoder) is only "
        "meaningful for encoder_arch=blstm — the attention listeners "
        f"are inherently full-context (got {cfg.encoder_arch!r}); the "
        "conformer streams via model.enc_attn_chunk instead"
    )
    assert cfg.enc_attn_chunk == 0 or cfg.encoder_arch == "conformer", (
        "model.enc_attn_chunk (chunk-causal attention) is conformer-only "
        f"(got encoder_arch={cfg.encoder_arch!r})"
    )
    if cfg.encoder_arch == "transformer":
        from semi_supervised_asr_tpu.models import transformer_listener as TL

        return TL.init_transformer_listener, TL.transformer_listener_apply
    if cfg.encoder_arch == "conformer":
        from semi_supervised_asr_tpu.models import conformer_listener as CL

        return CL.init_conformer_listener, CL.conformer_listener_apply
    assert cfg.encoder_arch == "blstm", cfg.encoder_arch
    return L.init_listener, L.listener_apply


def init_model(key: jax.Array, cfg: ModelConfig):
    dtype = jnp.dtype(cfg.param_dtype)
    if cfg.family == "transducer":
        from semi_supervised_asr_tpu.models import transducer as TD

        return TD.init_transducer(key, cfg, dtype)
    if cfg.family == "ctc":
        from semi_supervised_asr_tpu.models import ctc_model as C

        return C.init_ctc_model(key, cfg, dtype)
    assert cfg.family == "las", cfg.family
    k_enc, k_dec, k_ctc = jax.random.split(key, 3)
    enc_init, _ = _listener_fns(cfg)
    params = {
        "listener": enc_init(k_enc, cfg, dtype),
        "speller": S.init_speller(k_dec, cfg, dtype),
    }
    if cfg.ctc_head:
        # joint CTC-attention (Kim et al. 2017): a linear CTC head on the
        # encoder regularizes alignments (objective.lambda_ctc)
        glorot = jax.nn.initializers.glorot_uniform()
        params["ctc"] = {
            "w": glorot(k_ctc, (cfg.enc_out_dim, cfg.vocab_size), dtype),
            "b": jnp.zeros((cfg.vocab_size,), dtype),
        }
    return params


def encode(
    params: dict,
    feats: jax.Array,
    feat_lens: jax.Array,
    cfg: ModelConfig,
    train: bool = False,
    dropout_rng: jax.Array | None = None,
    remat: bool = False,
):
    """-> (enc [B,T',2H], enc_mask [B,T'], keys [B,T',A]) — the decode cache.

    ``remat``: rematerialize the listener on the backward pass
    (jax.checkpoint) — trades FLOPs for HBM on large configs
    (train.remat_encoder, SURVEY.md B6/HBM note).
    """
    _, apply = _listener_fns(cfg)
    if remat:
        apply = jax.checkpoint(apply, static_argnums=(3, 4), policy=None)
    enc, enc_lens = apply(
        params["listener"], feats, feat_lens, cfg, train, dropout_rng
    )
    t = enc.shape[1]
    enc_mask = jnp.arange(t)[None, :] < enc_lens[:, None]
    keys = S.precompute_decode_cache(params["speller"], cfg, enc)
    return enc, enc_mask, keys


def forward_teacher(
    params: dict,
    cfg: ModelConfig,
    feats: jax.Array,
    feat_lens: jax.Array,
    tokens_in: jax.Array,
    tf_rate=1.0,
    rng: jax.Array | None = None,
    train: bool = False,
    remat: bool = False,
    return_enc: bool = False,
):
    """Full teacher-forced pass -> (logits [B,U,V], alphas [B,U,T']).

    ``return_enc``: also return (enc, enc_mask) — the CTC aux loss needs
    the encoder outputs without a second encode pass."""
    drop_rng = None
    if rng is not None:
        rng, drop_rng = jax.random.split(rng)
    enc, enc_mask, _ = encode(
        params, feats, feat_lens, cfg, train, drop_rng, remat
    )
    logits, alphas = S.forward_teacher(
        params["speller"], cfg, enc, enc_mask, tokens_in, tf_rate, rng, train
    )
    if return_enc:
        return logits, alphas, enc, enc_mask
    return logits, alphas


def param_count(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(params))
