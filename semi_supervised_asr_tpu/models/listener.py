"""Listener: pyramidal BiLSTM encoder (Chan et al. 2015, arXiv:1508.01211).

Reference counterpart: the pBLSTM `Encoder` (SURVEY.md §3 #8).  TPU-native
realization: ``enc_base_layers`` full-rate BiLSTMs followed by
``enc_layers`` pyramid stages, each a reshape time-fold (T -> T/2, feature
dim doubles) then a BiLSTM.  Total time reduction 2**enc_layers; buckets
must be divisible by it (enforced by the data pipeline).

Outputs are float32 [B, T', 2*enc_hidden] with exact zeros on pad frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.ops import recurrent as R


def init_listener(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.enc_base_layers + cfg.enc_layers)
    layers = []
    in_dim = cfg.n_mels
    for i in range(cfg.enc_base_layers):
        layers.append(R.bilstm_init(keys[i], in_dim, cfg.enc_hidden, dtype))
        in_dim = 2 * cfg.enc_hidden
    for j in range(cfg.enc_layers):
        k = keys[cfg.enc_base_layers + j]
        # pyramid fold doubles the feature dim before the BiLSTM
        layers.append(R.bilstm_init(k, 2 * in_dim, cfg.enc_hidden, dtype))
        in_dim = 2 * cfg.enc_hidden
    return {"layers": layers}


def listener_apply(
    params: dict,
    feats: jax.Array,          # [B, T, n_mels]
    feat_lens: jax.Array,      # [B]
    cfg: ModelConfig,
    train: bool = False,
    dropout_rng: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """-> (enc [B, T/2**L, 2H], enc_lens [B])."""
    compute = jnp.dtype(cfg.compute_dtype)
    x = feats.astype(jnp.float32)
    lens = feat_lens

    def maybe_dropout(h, i):
        if train and cfg.enc_dropout > 0.0 and dropout_rng is not None:
            k = jax.random.fold_in(dropout_rng, i)
            keep = 1.0 - cfg.enc_dropout
            m = jax.random.bernoulli(k, keep, h.shape)
            return jnp.where(m, h / keep, 0.0)
        return h

    if cfg.lstm_backend == "pallas":
        from semi_supervised_asr_tpu.ops.pallas_lstm import bilstm_pallas

        def run_bilstm(p, h, l):
            return bilstm_pallas(p, h, l, compute,
                                 block_t=cfg.lstm_block_t,
                                 fuse_directions=cfg.fuse_bilstm)
    else:
        def run_bilstm(p, h, l):
            return R.bilstm(p, h, l, compute, cfg.fuse_bilstm,
                            cfg.scan_unroll)

    li = 0
    for i in range(cfg.enc_base_layers):
        x = run_bilstm(params["layers"][li], x, lens)
        x = maybe_dropout(x, li)
        li += 1
    for _ in range(cfg.enc_layers):
        x, lens = R.pyramid_fold(x, lens)
        x = run_bilstm(params["layers"][li], x, lens)
        x = maybe_dropout(x, li)
        li += 1
    return x, lens


def output_frames(t_in: int, cfg: ModelConfig) -> int:
    assert t_in % cfg.time_reduction == 0, (
        f"bucket length {t_in} not divisible by time reduction "
        f"{cfg.time_reduction}"
    )
    return t_in // cfg.time_reduction
