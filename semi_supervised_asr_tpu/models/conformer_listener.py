"""Conformer listener: convolution-augmented transformer encoder.

Third encoder family behind the same ``seq2seq.encode`` surface
(``model.encoder_arch: conformer``), the standard modern ASR encoder
(Gulati et al. 2020, "Conformer").  Per block (macaron order):

* half-step feed-forward:  x += 0.5 * FF(LN(x))     (swish, ff_dim)
* self-attention:          x += MHSA(LN(x))          (RoPE positions)
* convolution module:      x += Conv(LN(x))
  — pointwise d->2d, GLU, depthwise conv (``conformer_conv_width``),
  LayerNorm, swish, pointwise d->d
* half-step feed-forward:  x += 0.5 * FF(LN(x))
* block output LayerNorm

TPU-first deviations from the paper, chosen for XLA/jit friendliness
and documented here on purpose:

* **Rotary positions (RoPE)** in place of Transformer-XL relative
  attention: parameter-free, static-shape, fuses into the q/k
  projections — no [T, T] relative-embedding gather.
* **LayerNorm** in place of BatchNorm inside the conv module: batch
  statistics need masked cross-batch reductions + running stats, which
  is both jit-unfriendly and wrong under variable pad fractions;
  per-position LayerNorm is the common substitute (e.g. ESPnet's
  ``norm_type: layer_norm`` option).
* Pad handling: attention masks pad KEYS additively, and the depthwise
  conv's INPUT is zero-masked so a window overlapping the pad boundary
  mixes in exact zeros — valid positions are bitwise independent of the
  frame bucket (pad-invariance contract, models/listener.py).

d_model = ``cfg.enc_out_dim`` so every downstream consumer (attention
key cache, speller, CTC head, export) is architecture-agnostic.
Reference counterpart: none — the reference is BLSTM-only (SURVEY.md
§3 #8); capability extension, ``blstm`` stays the parity default.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.models import listener as L
from semi_supervised_asr_tpu.ops import flash_mhsa as FM
from semi_supervised_asr_tpu.models.transformer_listener import (
    _glorot, _layer_norm,
)


def _ln_params(d, dtype):
    return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def _ff_params(key, d, ff, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "ln": _ln_params(d, dtype),
        "w1": _glorot(k1, (d, ff), dtype), "b1": jnp.zeros((ff,), dtype),
        "w2": _glorot(k2, (ff, d), dtype), "b2": jnp.zeros((d,), dtype),
    }


def init_conformer_listener(
    key: jax.Array, cfg: ModelConfig, dtype=jnp.float32
) -> dict:
    d = cfg.enc_out_dim
    assert d % cfg.enc_heads == 0, (
        f"d_model {d} (=2*enc_hidden) must divide enc_heads {cfg.enc_heads}"
    )
    assert (d // cfg.enc_heads) % 2 == 0, (
        f"RoPE rotates pairs: head dim {d // cfg.enc_heads} must be even"
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
        bk = jax.random.split(keys[2 + i], 9)
        params["blocks"].append({
            "ff1": _ff_params(bk[0], d, cfg.enc_ff_dim, dtype),
            "attn": {
                "ln": _ln_params(d, dtype),
                "wq": _glorot(bk[1], (d, d), dtype),
                "wk": _glorot(bk[2], (d, d), dtype),
                "wv": _glorot(bk[3], (d, d), dtype),
                "wo": _glorot(bk[4], (d, d), dtype),
                "bq": jnp.zeros((d,), dtype),
                "bk": jnp.zeros((d,), dtype),
                "bv": jnp.zeros((d,), dtype),
                "bo": jnp.zeros((d,), dtype),
            },
            "conv": {
                "ln": _ln_params(d, dtype),
                "w_pw1": _glorot(bk[5], (d, 2 * d), dtype),
                "b_pw1": jnp.zeros((2 * d,), dtype),
                # depthwise kernel [width, d] (one filter per channel)
                "w_dw": _glorot(bk[6], (cfg.conformer_conv_width, d), dtype),
                "b_dw": jnp.zeros((d,), dtype),
                "ln2": _ln_params(d, dtype),
                "w_pw2": _glorot(bk[7], (d, d), dtype),
                "b_pw2": jnp.zeros((d,), dtype),
            },
            "ff2": _ff_params(bk[8], d, cfg.enc_ff_dim, dtype),
            "ln_out": _ln_params(d, dtype),
        })
    return params


def _rope_angles(t: int, hd: int) -> np.ndarray:
    """Rotation angles [t, hd//2] — host-computed once per compiled
    shape; callers take cos/sin."""
    pos = np.arange(t, dtype=np.float64)[:, None]
    i = np.arange(hd // 2, dtype=np.float64)[None, :]
    return (pos / np.power(10000.0, 2.0 * i / hd)).astype(np.float32)


def _rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved pairs of ``x`` [b, t, h, hd] by position."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape)


def _mhsa_rope(
    p: dict, x: jax.Array, key_mask: jax.Array, n_heads: int, compute,
    backend: str = "xla",
) -> jax.Array:
    """MHSA with rotary q/k; pad keys masked additively; softmax fp32.
    ``backend="flash"`` (model.attn_backend) routes the score/softmax/
    context core through the Pallas flash kernel (ops/flash_mhsa.py) —
    RoPE composes unchanged, it rotates q/k before the product."""
    b, t, d = x.shape
    hd = d // n_heads
    xc = x.astype(compute)

    def proj(w, bias):
        return (xc @ w.astype(compute) + bias.astype(compute)).reshape(
            b, t, n_heads, hd)

    ang = jnp.asarray(_rope_angles(t, hd))
    cos = jnp.cos(ang)
    sin = jnp.sin(ang)
    q = _rope(proj(p["wq"], p["bq"]).astype(jnp.float32), cos, sin)
    k = _rope(proj(p["wk"], p["bk"]).astype(jnp.float32), cos, sin)
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
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q.astype(compute), k.astype(compute)
        ).astype(jnp.float32)
        scores = scores / np.sqrt(hd)
        scores = jnp.where(key_mask[:, None, None, :], scores, -1e9)
        alpha = jax.nn.softmax(scores, axis=-1).astype(compute)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", alpha, v).reshape(b, t, d)
    return (ctx @ p["wo"].astype(compute)
            + p["bo"].astype(compute)).astype(jnp.float32)


def _ff(p: dict, x: jax.Array, compute) -> jax.Array:
    h = _layer_norm(x, p["ln"])
    h = jax.nn.silu(
        h.astype(compute) @ p["w1"].astype(compute)
        + p["b1"].astype(compute)
    )
    return (h @ p["w2"].astype(compute)).astype(jnp.float32) \
        + p["b2"].astype(jnp.float32)


def _conv_module(
    p: dict, x: jax.Array, mask: jax.Array, compute
) -> jax.Array:
    """LN -> pointwise 2d + GLU -> masked depthwise conv -> LN -> swish
    -> pointwise.  ``mask`` [B, T] zeroes pad frames entering the
    depthwise conv so valid outputs are pad-invariant.

    The elementwise chain (GLU, mask, conv taps, swish) runs in the
    compute dtype, matching ``_ff``'s swish — the step is HBM-bound
    (DESIGN.md conformer roofline) and these [B, T, d]-stream buffers
    are the traffic; precision-carrying reductions stay fp32 (LayerNorm
    statistics via ``_layer_norm``, conv accumulation over the W taps
    in the fp32 accumulator below).  For fp32 configs every cast is a
    no-op, so CPU parity tests are bitwise-unchanged."""
    h = _layer_norm(x, p["ln"]).astype(compute)
    h = h @ p["w_pw1"].astype(compute) + p["b_pw1"].astype(compute)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)                          # GLU -> [B, T, d]
    h = jnp.where(mask[:, :, None], h, jnp.zeros((), compute))
    # Depthwise conv over time (SAME padding) written as W static
    # shifted multiply-adds: the taps stream from HBM in the compute
    # dtype and the accumulator is fp32 — pure elementwise ops that XLA
    # fuses into the surrounding chain, with none of
    # lax.conv_general_dilated's VJP dtype restrictions (its transpose
    # conv rejects a bf16 operand against an fp32 cotangent).  W is a
    # static Python int, so the unrolled loop is jit-stable.
    w = p["w_dw"].astype(jnp.float32)                  # [W, d]
    width = w.shape[0]
    left = (width - 1) // 2
    t = h.shape[1]
    hp = jnp.pad(h, ((0, 0), (left, width - 1 - left), (0, 0)))
    acc = jnp.zeros(h.shape, jnp.float32)
    for i in range(width):
        tap = jax.lax.slice_in_dim(hp, i, i + t, axis=1)
        acc = acc + tap.astype(jnp.float32) * w[i]
    h = acc + p["b_dw"].astype(jnp.float32)
    h = _layer_norm(h, p["ln2"]).astype(compute)
    h = jax.nn.silu(h)
    return (h @ p["w_pw2"].astype(compute)
            ).astype(jnp.float32) + p["b_pw2"].astype(jnp.float32)


def conformer_listener_apply(
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
    x = feats.astype(jnp.float32)
    lens = feat_lens
    if cfg.conv_subsample > 0:
        x, lens = L.conv_stem_apply(params["conv"], x, lens, cfg)
    x = (x.astype(compute) @ params["proj"]["w"].astype(compute)
         ).astype(jnp.float32) + params["proj"]["b"].astype(jnp.float32)
    t = x.shape[1]
    mask = jnp.arange(t)[None, :] < lens[:, None]      # [B, T']

    def maybe_dropout(h, i):
        if train and cfg.enc_dropout > 0.0 and dropout_rng is not None:
            k = jax.random.fold_in(dropout_rng, i)
            keep = 1.0 - cfg.enc_dropout
            m = jax.random.bernoulli(k, keep, h.shape)
            return jnp.where(m, h / keep, 0.0)
        return h

    for i, blk in enumerate(params["blocks"]):
        x = x + 0.5 * maybe_dropout(_ff(blk["ff1"], x, compute), 4 * i)
        h = _mhsa_rope(blk["attn"], _layer_norm(x, blk["attn"]["ln"]),
                       mask, cfg.enc_heads, compute,
                       backend=cfg.attn_backend)
        x = x + maybe_dropout(h, 4 * i + 1)
        x = x + maybe_dropout(
            _conv_module(blk["conv"], x, mask, compute), 4 * i + 2
        )
        x = x + 0.5 * maybe_dropout(_ff(blk["ff2"], x, compute), 4 * i + 3)
        x = _layer_norm(x, blk["ln_out"])
    # listener contract: EXACT zeros on pad frames
    return jnp.where(mask[:, :, None], x, 0.0), lens
