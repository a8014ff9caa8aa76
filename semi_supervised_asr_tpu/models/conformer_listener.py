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
    """Rotate interleaved pairs of ``x`` [b, t, h, hd] by position.
    ``cos``/``sin`` are [t, hd//2] (offline: one position grid shared by
    the batch) or [b, t, hd//2] (streaming: per-row absolute positions —
    multi-stream slots sit at different points in their utterances)."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    c = cos[None, :, None, :] if cos.ndim == 2 else cos[:, :, None, :]
    s = sin[None, :, None, :] if sin.ndim == 2 else sin[:, :, None, :]
    out = jnp.stack([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)
    return out.reshape(x.shape)


def _chunk_mask(t: int, chunk: int, left_chunks: int) -> np.ndarray:
    """[t, t] bool visibility for chunk-causal attention
    (``model.enc_attn_chunk``): query in chunk c sees keys in chunks
    [c - left_chunks, c] (all of them: attention is FULL inside a chunk
    and over the allowed left chunks, zero ahead — the WeNet-U2
    convention that makes per-chunk streaming the same computation as
    the offline forward).  Host-computed; static per compiled shape."""
    c = np.arange(t) // chunk
    vis = c[None, :] <= c[:, None]
    if left_chunks >= 0:
        vis &= c[:, None] - c[None, :] <= left_chunks
    return vis


def _mhsa_rope(
    p: dict, x: jax.Array, key_mask: jax.Array, n_heads: int, compute,
    backend: str = "xla",
    chunk_mask: np.ndarray | None = None,
) -> jax.Array:
    """MHSA with rotary q/k; pad keys masked additively; softmax fp32.
    ``backend="flash"`` (model.attn_backend) routes the score/softmax/
    context core through the Pallas flash kernel (ops/flash_mhsa.py) —
    RoPE composes unchanged, it rotates q/k before the product.
    ``chunk_mask`` ([t, t] static bool, from ``_chunk_mask``) further
    restricts which keys each query sees (chunk-causal conformer)."""
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
    assert chunk_mask is None or backend == "xla", (
        "enc_attn_chunk needs attn_backend=xla — the flash kernel's "
        "segment ids cannot express a sliding left-context window"
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
        vis = key_mask[:, None, None, :]
        if chunk_mask is not None:
            vis = vis & jnp.asarray(chunk_mask)[None, None, :, :]
        scores = jnp.where(vis, scores, -1e9)
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
    p: dict, x: jax.Array, mask: jax.Array, compute,
    causal: bool = False,
) -> jax.Array:
    """LN -> pointwise 2d + GLU -> masked depthwise conv -> LN -> swish
    -> pointwise.  ``mask`` [B, T] zeroes pad frames entering the
    depthwise conv so valid outputs are pad-invariant.  ``causal``
    (chunk-causal conformer, ``model.enc_attn_chunk``) left-pads the
    depthwise conv with the full width-1 instead of centering it, so
    frame t reads only frames <= t and the module streams with a
    width-1-frame cache.

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
    left = width - 1 if causal else (width - 1) // 2
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
    chunked = cfg.enc_attn_chunk > 0
    x = feats.astype(jnp.float32)
    lens = feat_lens
    if cfg.conv_subsample > 0:
        # chunked => causal stem (no lookahead) so the stem streams too
        x, lens = L.conv_stem_apply(
            params["conv"], x, lens, cfg, causal=chunked
        )
    x = (x.astype(compute) @ params["proj"]["w"].astype(compute)
         ).astype(jnp.float32) + params["proj"]["b"].astype(jnp.float32)
    t = x.shape[1]
    mask = jnp.arange(t)[None, :] < lens[:, None]      # [B, T']
    cmask = _chunk_mask(t, cfg.enc_attn_chunk, cfg.enc_attn_left_chunks) \
        if chunked else None

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
                       backend=cfg.attn_backend, chunk_mask=cmask)
        x = x + maybe_dropout(h, 4 * i + 1)
        x = x + maybe_dropout(
            _conv_module(blk["conv"], x, mask, compute, causal=chunked),
            4 * i + 2,
        )
        x = x + 0.5 * maybe_dropout(_ff(blk["ff2"], x, compute), 4 * i + 3)
        x = _layer_norm(x, blk["ln_out"])
    # listener contract: EXACT zeros on pad frames
    return jnp.where(mask[:, :, None], x, 0.0), lens


# ---------------------------------------------------------------------------
# Chunked streaming (model.enc_attn_chunk > 0, enc_attn_left_chunks >= 0)
#
# Per-chunk inference computing the SAME function as the offline
# chunk-masked forward: attention caches the last left_chunks*chunk
# frames of rotated keys / values per block, the causal depthwise conv
# caches its last width-1 GLU frames, and RoPE angles come from one
# host-precomputed table indexed by the absolute frame position carried
# in the state.  Numerics: the conv / FF / LayerNorm chains are
# bitwise-identical to offline (same values, same op order); attention
# differs only in softmax/matmul reduction ORDER (the offline row sums
# exact-zero masked terms the streaming row omits), so parity is
# ulp-scale, pinned by tests/test_streaming_conformer.py, and decode
# tokens are identical.  Contract: feed full enc_attn_chunk-frame
# chunks; ``frame_lens`` only on the FINAL (partial) chunk — cached
# frames are assumed valid, which holds per-utterance (B=1 streaming).
# ---------------------------------------------------------------------------


def conformer_rope_table(
    cfg: ModelConfig, max_frames: int
) -> tuple[jax.Array, jax.Array]:
    """(cos, sin) [max_frames, head_dim//2] — the absolute-position
    rotation table streaming slices at the carried offset.  Host fp64,
    matching the offline path's ``_rope_angles`` bit-for-bit."""
    hd = cfg.enc_out_dim // cfg.enc_heads
    ang = jnp.asarray(_rope_angles(max_frames, hd))
    return jnp.cos(ang), jnp.sin(ang)


def _stream_asserts(cfg: ModelConfig) -> None:
    assert cfg.encoder_arch == "conformer", cfg.encoder_arch
    assert cfg.enc_attn_chunk > 0, (
        "conformer streaming needs model.enc_attn_chunk > 0 "
        "(chunk-causal attention)"
    )
    assert cfg.enc_attn_left_chunks >= 0, (
        "conformer streaming needs model.enc_attn_left_chunks >= 0 — "
        "unlimited left context would need an unbounded cache"
    )


def conformer_stream_init(cfg: ModelConfig, b: int) -> dict:
    """Zero caches: per block the last W = left_chunks*chunk frames of
    rotated keys (fp32) / values (compute dtype) and the causal conv's
    width-1 GLU tail; plus the causal stem's per-block 2-frame carries
    (conv_subsample > 0) and the absolute frame position."""
    _stream_asserts(cfg)
    compute = jnp.dtype(cfg.compute_dtype)
    d = cfg.enc_out_dim
    hd = d // cfg.enc_heads
    w_ctx = cfg.enc_attn_left_chunks * cfg.enc_attn_chunk
    blocks = tuple(
        {
            "k": jnp.zeros((b, w_ctx, cfg.enc_heads, hd), jnp.float32),
            "v": jnp.zeros((b, w_ctx, cfg.enc_heads, hd), compute),
            "conv": jnp.zeros(
                (b, cfg.conformer_conv_width - 1, d), compute
            ),
        }
        for _ in range(cfg.enc_blocks)
    )
    return {
        # per-row: multi-stream slots live at different absolute frames
        "pos": jnp.zeros((b,), jnp.int32),
        "stem": L.conv_stem_stream_init(cfg, b),
        "blocks": blocks,
    }


def _mhsa_rope_stream(
    p: dict, x: jax.Array, st: dict, cache_valid: jax.Array,
    cur_mask: jax.Array, n_heads: int, compute,
    cos: jax.Array, sin: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One chunk of chunk-causal MHSA against the (cache ++ chunk) keys.
    -> (out [B,t,d] fp32, new k cache, new v cache)."""
    b, t, d = x.shape
    hd = d // n_heads
    xc = x.astype(compute)

    def proj(w, bias):
        return (xc @ w.astype(compute) + bias.astype(compute)).reshape(
            b, t, n_heads, hd)

    q = _rope(proj(p["wq"], p["bq"]).astype(jnp.float32), cos, sin)
    k_new = _rope(proj(p["wk"], p["bk"]).astype(jnp.float32), cos, sin)
    v_new = proj(p["wv"], p["bv"])
    k_all = jnp.concatenate([st["k"], k_new], axis=1)
    v_all = jnp.concatenate([st["v"].astype(compute), v_new], axis=1)
    key_mask = jnp.concatenate(
        [jnp.broadcast_to(cache_valid, (b, st["k"].shape[1])),
         cur_mask], axis=1,
    )
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(compute), k_all.astype(compute)
    ).astype(jnp.float32) / np.sqrt(hd)
    scores = jnp.where(key_mask[:, None, None, :], scores, -1e9)
    alpha = jax.nn.softmax(scores, axis=-1).astype(compute)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", alpha, v_all).reshape(b, t, d)
    out = (ctx @ p["wo"].astype(compute)
           + p["bo"].astype(compute)).astype(jnp.float32)
    w_ctx = st["k"].shape[1]
    keep = k_all.shape[1] - w_ctx
    new_k = jax.lax.slice_in_dim(k_all, keep, k_all.shape[1], axis=1)
    new_v = jax.lax.slice_in_dim(
        v_all, keep, v_all.shape[1], axis=1
    ).astype(st["v"].dtype)
    return out, new_k, new_v


def _conv_module_stream(
    p: dict, x: jax.Array, mask: jax.Array, compute, conv_cache: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Causal ``_conv_module`` resuming from the previous chunk's last
    width-1 GLU frames (zeros on chunk 1 == the offline left padding).
    Bitwise-equal to the offline causal path: same taps, same order."""
    h = _layer_norm(x, p["ln"]).astype(compute)
    h = h @ p["w_pw1"].astype(compute) + p["b_pw1"].astype(compute)
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g)
    h = jnp.where(mask[:, :, None], h, jnp.zeros((), compute))
    w = p["w_dw"].astype(jnp.float32)
    width = w.shape[0]
    t = h.shape[1]
    hp = jnp.concatenate([conv_cache.astype(compute), h], axis=1)
    acc = jnp.zeros(h.shape, jnp.float32)
    for i in range(width):
        tap = jax.lax.slice_in_dim(hp, i, i + t, axis=1)
        acc = acc + tap.astype(jnp.float32) * w[i]
    new_cache = jax.lax.slice_in_dim(
        hp, t, hp.shape[1], axis=1
    ).astype(conv_cache.dtype)
    h = acc + p["b_dw"].astype(jnp.float32)
    h = _layer_norm(h, p["ln2"]).astype(compute)
    h = jax.nn.silu(h)
    out = (h @ p["w_pw2"].astype(compute)
           ).astype(jnp.float32) + p["b_pw2"].astype(jnp.float32)
    return out, new_cache


def conformer_listener_apply_stream(
    params: dict,
    feats: jax.Array,   # [B, enc_attn_chunk * 2**conv_subsample, n_mels]
    cfg: ModelConfig,
    state: dict,               # conformer_stream_init / previous chunk
    rope: tuple[jax.Array, jax.Array],   # conformer_rope_table
    frame_lens: jax.Array | None = None,  # [B], FINAL partial chunk only
) -> tuple[jax.Array, dict]:
    """One streaming chunk -> (enc [B, chunk, d] fp32, new state).
    ``feats`` carries one attention chunk's worth of FEATURE frames
    (enc_attn_chunk encoder frames x the stem's 2**conv_subsample);
    inference-only (no dropout); parity contract in the section header."""
    _stream_asserts(cfg)
    compute = jnp.dtype(cfg.compute_dtype)
    chunk = cfg.enc_attn_chunk
    b, t_in, _ = feats.shape
    assert t_in == chunk * 2 ** cfg.conv_subsample, (
        f"stream chunks must be exactly enc_attn_chunk * "
        f"2**conv_subsample feature frames (got {t_in}, want "
        f"{chunk * 2 ** cfg.conv_subsample})"
    )
    x = feats.astype(jnp.float32)
    lens = frame_lens
    new_stem = state["stem"]
    if cfg.conv_subsample > 0:
        x, new_stem, lens = L.conv_stem_stream(
            params["conv"], x, cfg, state["stem"], lens=lens
        )
    t = chunk
    x = (x.astype(compute) @ params["proj"]["w"].astype(compute)
         ).astype(jnp.float32) + params["proj"]["b"].astype(jnp.float32)
    if lens is None:
        mask = jnp.ones((b, t), bool)
    else:
        mask = jnp.arange(t)[None, :] < lens[:, None]
    pos = state["pos"]                              # [b] absolute frames
    idx = pos[:, None] + jnp.arange(t)[None, :]     # [b, t] per-row grid
    cos, sin = rope[0][idx], rope[1][idx]           # [b, t, hd//2]
    w_ctx = cfg.enc_attn_left_chunks * chunk
    cache_valid = jnp.arange(w_ctx)[None, :] \
        >= w_ctx - jnp.minimum(pos, w_ctx)[:, None]  # [b, w_ctx]
    new_blocks = []
    for i, blk in enumerate(params["blocks"]):
        st = state["blocks"][i]
        x = x + 0.5 * _ff(blk["ff1"], x, compute)
        h, new_k, new_v = _mhsa_rope_stream(
            blk["attn"], _layer_norm(x, blk["attn"]["ln"]), st,
            cache_valid, mask, cfg.enc_heads, compute, cos, sin,
        )
        x = x + h
        h, new_conv = _conv_module_stream(
            blk["conv"], x, mask, compute, st["conv"]
        )
        x = x + h
        x = x + 0.5 * _ff(blk["ff2"], x, compute)
        x = _layer_norm(x, blk["ln_out"])
        new_blocks.append({"k": new_k, "v": new_v, "conv": new_conv})
    out = jnp.where(mask[:, :, None], x, 0.0)
    return out, {
        "pos": pos + chunk,
        "stem": new_stem,
        "blocks": tuple(new_blocks),
    }
