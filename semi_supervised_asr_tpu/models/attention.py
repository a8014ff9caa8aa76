"""Attention mechanisms for the speller (SURVEY.md §3 #9).

Default: location-aware attention (Chorowski et al. 2015, arXiv:1506.07503)
score_t = v . tanh(W_q s + W_k h_t + W_f f_t + b), where f = conv1d over the
previous alignment alpha.  ``model.attn_type`` also offers:

* "additive" — Bahdanau content-only scoring (same MLP, no location conv);
* "dot"      — scaled dot-product (W_q s) . (W_k h_t) / sqrt(A); the
  cheapest step, no tanh MLP.

TPU-native realization:

* the key projection ``W_k h`` is computed ONCE per utterance and cached —
  it is also the beam-search encoder cache (BASELINE.json:9);
* the location conv is a ``lax.conv_general_dilated`` with SAME padding;
* padding frames receive an additive -inf before the softmax, so pads get
  exactly zero probability (SURVEY.md §5.2 mask correctness).

All functions are pure; params is a flat dict pytree.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from semi_supervised_asr_tpu.config import ModelConfig

NEG_INF = -1e30


def init_attention(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32):
    kq, kk, kf, kc, kv = jax.random.split(key, 5)
    a = cfg.attn_dim
    glorot = jax.nn.initializers.glorot_uniform()
    params = {
        "w_query": glorot(kq, (cfg.dec_hidden, a), dtype),
        "w_key": glorot(kk, (cfg.enc_out_dim, a), dtype),
    }
    if cfg.attn_type == "dot":
        return params
    params.update({
        "bias": jnp.zeros((a,), dtype),
        "v": glorot(kv, (a, 1), dtype).reshape(-1),
    })
    if cfg.attn_type == "location":
        params.update({
            "w_loc": glorot(kf, (cfg.attn_conv_channels, a), dtype),
            # conv filters over the previous alignment: [width, 1, channels]
            "conv": jax.random.normal(
                kc, (cfg.attn_conv_width, 1, cfg.attn_conv_channels), dtype
            ) * (1.0 / math.sqrt(cfg.attn_conv_width)),
        })
    elif cfg.attn_type != "additive":
        raise ValueError(f"unknown attn_type {cfg.attn_type!r}")
    return params


def precompute_keys(params: dict, enc: jax.Array) -> jax.Array:
    """[B, T, enc_out] -> [B, T, A]; computed once, cached across decode."""
    return jnp.einsum(
        "bte,ea->bta", enc, params["w_key"], preferred_element_type=jnp.float32
    )


def location_features(params: dict, alpha: jax.Array) -> jax.Array:
    """Conv over the previous alignment: [B, T] -> [B, T, C] (SAME pad)."""
    out = lax.conv_general_dilated(
        alpha[..., None],            # [B, T, 1]
        # cast to the alignment's dtype: bf16-quantized export params
        # would otherwise mix dtypes (lax.conv requires them equal)
        params["conv"].astype(alpha.dtype),  # [W, 1, C]
        window_strides=(1,),
        padding="SAME",
        dimension_numbers=("NTC", "TIO", "NTC"),
    )
    return out


def attend(
    params: dict,
    query: jax.Array,        # [B*, dec_hidden]   (B* may be B*K in beam)
    prev_alpha: jax.Array,   # [B*, T]
    keys: jax.Array,         # [B*, T, A] cached W_k h
    values: jax.Array,       # [B*, T, enc_out]
    mask: jax.Array,         # [B*, T] bool, True on valid frames
    sharpening: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """One attention step -> (context [B*, enc_out], alpha [B*, T])."""
    q = jnp.einsum(
        "bd,da->ba", query, params["w_query"],
        preferred_element_type=jnp.float32,
    )
    if "v" not in params:                              # dot product
        scores = jnp.einsum(
            "ba,bta->bt", q, keys, preferred_element_type=jnp.float32
        ) / math.sqrt(q.shape[-1])
    else:
        e = q[:, None, :] + keys + params["bias"]
        if "conv" in params:                           # location-aware
            f = location_features(params, prev_alpha)  # [B*, T, C]
            e = e + jnp.einsum(
                "btc,ca->bta", f, params["w_loc"],
                preferred_element_type=jnp.float32,
            )
        scores = jnp.einsum("bta,a->bt", jnp.tanh(e), params["v"])
    scores = jnp.where(mask, scores * sharpening, NEG_INF)
    alpha = jax.nn.softmax(scores, axis=-1)
    alpha = jnp.where(mask, alpha, 0.0)  # exact zeros on pads
    context = jnp.einsum(
        "bt,bte->be", alpha, values, preferred_element_type=jnp.float32
    )
    return context, alpha


def initial_alpha(mask: jax.Array) -> jax.Array:
    """Uniform alignment over valid frames: [B*, T]."""
    m = mask.astype(jnp.float32)
    return m / jnp.maximum(jnp.sum(m, axis=-1, keepdims=True), 1.0)
