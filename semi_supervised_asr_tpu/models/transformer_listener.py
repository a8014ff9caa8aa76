"""Transformer listener: conv-subsampled self-attention encoder.

TPU-first alternative to the pyramidal BiLSTM (``model.encoder_arch:
transformer``).  The pBLSTM's wall clock is pinned by the serial h->h
dependency of its scans (DESIGN.md roofline: ~4.4us/step latency floor,
~23% MFU); a self-attention encoder is MXU-dense with NO serial chain —
every position computes in parallel — so step time drops and MFU rises
at equal parameter count.  Architecture (the standard speech recipe,
cf. Karita et al. 2019 / ESPnet transformer-ASR, PAPERS.md toolkit row):

* optional ESPnet-style stride-2 conv stem (``model.conv_subsample``
  blocks — 2 gives the canonical 4x frame-rate reduction; the
  transformer has no pyramid, so total reduction is 2**conv_subsample);
* linear projection to d_model + sinusoidal positions;
* ``enc_blocks`` pre-LN blocks: MHSA (pad keys masked additively) and a
  GELU FFN, residual around each; final LayerNorm.

d_model = ``cfg.enc_out_dim`` (= 2*enc_hidden), so every downstream
consumer — attention key cache, speller context, CTC head, export —
is architecture-agnostic.  Outputs are float32 with EXACT zeros on pad
frames (the listener contract, models/listener.py).

Reference counterpart: none — the reference is BLSTM-only (SURVEY.md §3
#8); this is a capability extension, and ``blstm`` remains the parity
default.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.models import listener as L
from semi_supervised_asr_tpu.ops import flash_mhsa as FM


def _glorot(key, shape, dtype):
    return jax.nn.initializers.glorot_uniform()(key, shape, dtype)


def init_transformer_listener(
    key: jax.Array, cfg: ModelConfig, dtype=jnp.float32
) -> dict:
    d = cfg.enc_out_dim
    ff = cfg.enc_ff_dim
    assert d % cfg.enc_heads == 0, (
        f"d_model {d} (=2*enc_hidden) must divide enc_heads {cfg.enc_heads}"
    )
    keys = jax.random.split(key, 2 + cfg.enc_blocks)
    params: dict = {}
    in_dim = cfg.n_mels
    if cfg.conv_subsample > 0:
        params["conv"] = L.conv_stem_init(keys[0], cfg, dtype)
        in_dim = L.conv_stem_dims(cfg)
    params["proj"] = {
        "w": _glorot(keys[1], (in_dim, d), dtype),
        "b": jnp.zeros((d,), dtype),
    }
    params["blocks"] = []
    for i in range(cfg.enc_blocks):
        bk = jax.random.split(keys[2 + i], 6)
        params["blocks"].append({
            "ln1": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
            "attn": {
                "wq": _glorot(bk[0], (d, d), dtype),
                "wk": _glorot(bk[1], (d, d), dtype),
                "wv": _glorot(bk[2], (d, d), dtype),
                "wo": _glorot(bk[3], (d, d), dtype),
                "bq": jnp.zeros((d,), dtype),
                "bk": jnp.zeros((d,), dtype),
                "bv": jnp.zeros((d,), dtype),
                "bo": jnp.zeros((d,), dtype),
            },
            "ln2": {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)},
            "ffn": {
                "w1": _glorot(bk[4], (d, ff), dtype),
                "b1": jnp.zeros((ff,), dtype),
                "w2": _glorot(bk[5], (ff, d), dtype),
                "b2": jnp.zeros((d,), dtype),
            },
        })
    params["ln_f"] = {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}
    return params


def _layer_norm(x: jax.Array, p: dict) -> jax.Array:
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * p["g"].astype(
        jnp.float32) + p["b"].astype(jnp.float32)


def sinusoidal_positions(t: int, d: int) -> np.ndarray:
    """Vaswani 2017 fixed positions [t, d] (fp32, host-computed once per
    compiled shape — t is static under jit)."""
    pos = np.arange(t, dtype=np.float64)[:, None]
    i = np.arange(d // 2, dtype=np.float64)[None, :]
    ang = pos / np.power(10000.0, 2.0 * i / d)
    pe = np.zeros((t, d), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return pe


def _mhsa(
    p: dict, x: jax.Array, key_mask: jax.Array, n_heads: int, compute,
    backend: str = "xla",
) -> jax.Array:
    """Multi-head self-attention; pad KEYS masked additively.  Matmuls in
    ``compute`` dtype (MXU), softmax in fp32.  ``backend="flash"``
    (model.attn_backend) routes the score/softmax/context core through
    the Pallas flash kernel (ops/flash_mhsa.py) — same masking
    semantics, scores never materialized in HBM."""
    b, t, d = x.shape
    hd = d // n_heads
    xc = x.astype(compute)

    def proj(w, bias):
        return (xc @ w.astype(compute) + bias.astype(compute)).reshape(
            b, t, n_heads, hd)

    q = proj(p["wq"], p["bq"])
    k = proj(p["wk"], p["bk"])
    v = proj(p["wv"], p["bv"])
    assert backend in ("xla", "flash"), (
        f"unknown model.attn_backend {backend!r}"
    )
    if backend == "flash":
        ctx = FM.mhsa(
            q, k, v, key_mask, sm_scale=float(1.0 / np.sqrt(hd)),
            compute=compute,
        ).reshape(b, t, d)
    else:
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores / np.sqrt(hd)
        scores = jnp.where(key_mask[:, None, None, :], scores, -1e9)
        alpha = jax.nn.softmax(scores, axis=-1).astype(compute)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", alpha, v).reshape(b, t, d)
    return (ctx @ p["wo"].astype(compute)
            + p["bo"].astype(compute)).astype(jnp.float32)


def transformer_listener_apply(
    params: dict,
    feats: jax.Array,          # [B, T, n_mels], zeros on pad frames
    feat_lens: jax.Array,      # [B]
    cfg: ModelConfig,
    train: bool = False,
    dropout_rng: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """-> (enc [B, T/2**conv_subsample, d_model] fp32, enc_lens [B]).
    Same signature/contract as listener.listener_apply."""
    compute = jnp.dtype(cfg.compute_dtype)
    d = cfg.enc_out_dim
    x = feats.astype(jnp.float32)
    lens = feat_lens
    if cfg.conv_subsample > 0:
        x, lens = L.conv_stem_apply(params["conv"], x, lens, cfg)
    x = (x.astype(compute) @ params["proj"]["w"].astype(compute)
         ).astype(jnp.float32) + params["proj"]["b"].astype(jnp.float32)
    t = x.shape[1]
    x = x * np.sqrt(d) + jnp.asarray(sinusoidal_positions(t, d))
    mask = jnp.arange(t)[None, :] < lens[:, None]      # [B, T']

    def maybe_dropout(h, i):
        if train and cfg.enc_dropout > 0.0 and dropout_rng is not None:
            k = jax.random.fold_in(dropout_rng, i)
            keep = 1.0 - cfg.enc_dropout
            m = jax.random.bernoulli(k, keep, h.shape)
            return jnp.where(m, h / keep, 0.0)
        return h

    for i, blk in enumerate(params["blocks"]):
        h = _mhsa(blk["attn"], _layer_norm(x, blk["ln1"]), mask,
                  cfg.enc_heads, compute, backend=cfg.attn_backend)
        x = x + maybe_dropout(h, 2 * i)
        h = _layer_norm(x, blk["ln2"])
        h = jax.nn.gelu(
            h.astype(compute) @ blk["ffn"]["w1"].astype(compute)
            + blk["ffn"]["b1"].astype(compute)
        )
        h = (h @ blk["ffn"]["w2"].astype(compute)).astype(jnp.float32) \
            + blk["ffn"]["b2"].astype(jnp.float32)
        x = x + maybe_dropout(h, 2 * i + 1)
    x = _layer_norm(x, params["ln_f"])
    # listener contract: EXACT zeros on pad frames
    return jnp.where(mask[:, :, None], x, 0.0), lens
