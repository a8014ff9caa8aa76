"""Transformer speller: causal self-attention decoder with cross-attention.

TPU-first alternative to the location-aware LSTM speller
(``model.decoder_arch: transformer``) — the modern attention-encoder-
decoder (AED) recipe (Vaswani 2017 decoder; Karita et al. 2019 for the
speech instantiation, cf. the ESPnet toolkit row in PAPERS.md).  Why it
exists beside the reference-parity LSTM speller (SURVEY.md §3 #10):

* **Training is ONE parallel pass** — causal self-attention over all U
  target positions at once, no serial ``lax.scan`` over decode steps.
  The LSTM speller's teacher-forced scan is latency-bound on the h->h
  dependency (DESIGN.md roofline); this decoder is MXU-dense.
* **Decode is the same KV-cache step the transformer LM uses**
  (models/lm.py:224): per-step one-hot cache writes, per-row positions,
  every state leaf carries the lattice row on axis 0 so the batched jit
  beam's gather-reorder (decode/beam.py) works unchanged.

Interface parity with the LSTM speller (models/speller.py dispatches on
``cfg.decoder_arch``): ``init`` / ``precompute_cross`` (the decode cache,
playing the role of the attention key projections) / ``init_state`` /
``step`` (-> state, logits, alpha) / ``forward_teacher`` (-> logits,
alphas).  The per-step ``alpha`` is the LAST block's cross-attention
averaged over heads — the coverage/heatmap proxy standard for AED models.

Constraints vs the LSTM speller (asserted in training/train_step.py):
scheduled sampling is incompatible with the parallel pass (teacher
forcing only — tf_rate must stay 1.0), and deep/cold LM fusion is
LSTM-only (shallow fusion at decode time works for both).  d_model is
``cfg.dec_hidden``; ``cfg.embed_dim`` is unused (the embedding table is
[V, d_model]).  ``cfg.dec_max_len`` caps the learned positions — both
the training target length and the decode step count must fit.

Reference counterpart: none — the reference is LSTM-only; this is a
capability extension, and ``lstm`` remains the parity default.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig

NEG_INF = -1e30


def _glorot(key, shape, dtype):
    return jax.nn.initializers.glorot_uniform()(key, shape, dtype)


def _ln(x, g, b):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * g.astype(
        jnp.float32) + b.astype(jnp.float32)


def _heads(x: jax.Array, n: int) -> jax.Array:
    """[..., D] -> [..., n, D/n]."""
    return x.reshape(x.shape[:-1] + (n, x.shape[-1] // n))


def init_transformer_speller(
    key: jax.Array, cfg: ModelConfig, dtype=jnp.float32
) -> dict:
    d = cfg.dec_hidden
    e = cfg.enc_out_dim
    ff = cfg.dec_ff_dim
    assert d % cfg.dec_heads == 0, (
        f"d_model {d} (=dec_hidden) must divide dec_heads {cfg.dec_heads}"
    )
    dh = d // cfg.dec_heads
    keys = jax.random.split(key, 3 + cfg.dec_blocks)
    params: dict = {
        "embedding": jax.random.normal(
            keys[0], (cfg.vocab_size, d), dtype
        ) * (1.0 / jnp.sqrt(jnp.float32(d))),
        "pos": jax.random.normal(keys[1], (cfg.dec_max_len, d), dtype) * 0.02,
        "b_out": jnp.zeros((cfg.vocab_size,), dtype),
    }
    if not cfg.tie_embedding:
        params["w_out"] = _glorot(keys[2], (d, cfg.vocab_size), dtype)

    def qkv(k, in_dim):
        # stored [in, H, Dh]: head count lives in the SHAPE (lm.py idiom —
        # orbax/optax trees stay array-only, the step fn needs no config)
        return _glorot(k, (in_dim, d), dtype).reshape(in_dim, cfg.dec_heads,
                                                      dh)

    blocks = []
    for i in range(cfg.dec_blocks):
        bk = jax.random.split(keys[3 + i], 9)
        blocks.append({
            "ln1_g": jnp.ones((d,), dtype), "ln1_b": jnp.zeros((d,), dtype),
            "wq": qkv(bk[0], d),
            "wk": qkv(bk[1], d),
            "wv": qkv(bk[2], d),
            "wo": _glorot(bk[3], (d, d), dtype),
            "ln2_g": jnp.ones((d,), dtype), "ln2_b": jnp.zeros((d,), dtype),
            "cq": qkv(bk[4], d),
            "ck": qkv(bk[5], e),
            "cv": qkv(bk[6], e),
            "co": _glorot(bk[7], (d, d), dtype),
            "ln3_g": jnp.ones((d,), dtype), "ln3_b": jnp.zeros((d,), dtype),
            "w1": _glorot(bk[8], (d, ff), dtype),
            "b1": jnp.zeros((ff,), dtype),
            "w2": _glorot(jax.random.fold_in(bk[8], 1), (ff, d), dtype),
            "b2": jnp.zeros((d,), dtype),
        })
    params["blocks"] = blocks
    params["lnf_g"] = jnp.ones((d,), dtype)
    params["lnf_b"] = jnp.zeros((d,), dtype)
    return params


def precompute_cross(params: dict, cfg: ModelConfig, enc: jax.Array) -> dict:
    """Per-layer cross-attention K/V projections of the encoder outputs —
    the decode cache (the transformer analog of attention.precompute_keys;
    computed once, tiled to lattice rows, NEVER reordered).

    -> {"ck": [B, L, T, D], "cv": [B, L, T, D]} fp32 (row axis 0)."""
    compute = jnp.dtype(cfg.compute_dtype)
    encc = enc.astype(compute)
    cks, cvs = [], []
    for blk in params["blocks"]:
        cks.append(jnp.einsum(
            "bte,ehd->bthd", encc, blk["ck"].astype(compute),
            preferred_element_type=jnp.float32,
        ).reshape(enc.shape[0], enc.shape[1], -1))
        cvs.append(jnp.einsum(
            "bte,ehd->bthd", encc, blk["cv"].astype(compute),
            preferred_element_type=jnp.float32,
        ).reshape(enc.shape[0], enc.shape[1], -1))
    return {"ck": jnp.stack(cks, axis=1), "cv": jnp.stack(cvs, axis=1)}


def init_state(batch: int, cfg: ModelConfig, max_steps: int) -> dict:
    """Fresh KV-cache decode state for ``batch`` lattice rows.

    ``max_steps`` (the decode loop length) sizes the cache; it must fit
    under the learned positions (``cfg.dec_max_len``) — the same class of
    invariant as the fusion LM's (export.py's lm.max_len guard)."""
    assert max_steps <= cfg.dec_max_len, (
        f"decode needs {max_steps} steps but model.dec_max_len is "
        f"{cfg.dec_max_len} — raise dec_max_len (retrain) or lower "
        "decode.max_decode_len"
    )
    d = cfg.dec_hidden
    n = cfg.dec_blocks
    return {
        "kv_k": jnp.zeros((batch, n, max_steps, d), jnp.float32),
        "kv_v": jnp.zeros((batch, n, max_steps, d), jnp.float32),
        "dpos": jnp.zeros((batch,), jnp.int32),
    }


def step(
    params: dict,
    cfg: ModelConfig,
    state: dict,
    tokens: jax.Array,      # [B*] int32 previous tokens
    cross: dict,            # precompute_cross output, tiled to [B*, ...]
    enc_mask: jax.Array,    # [B*, T] valid-frame mask
) -> tuple[dict, jax.Array, jax.Array]:
    """One decode step -> (new_state, logits [B*, V], alpha [B*, T]).

    Mirrors models/lm.py transformer_lm_step: per-row positions ``dpos``,
    one-hot KV write, causal mask = positions <= own depth.  All lattice
    rows advance together under the LAS beam (uniform positions), but the
    per-row form keeps the leaf reorderable by gather like every other
    state leaf."""
    compute = jnp.dtype(cfg.compute_dtype)
    n_heads = cfg.dec_heads
    b = tokens.shape[0]
    ucap = state["kv_k"].shape[2]
    pos = state["dpos"]                                       # [B]
    write = jnp.arange(ucap)[None, :] == pos[:, None]         # [B, Ucap]
    live = jnp.arange(ucap)[None, :] <= pos[:, None]          # [B, Ucap]

    x = params["embedding"][tokens].astype(jnp.float32)
    x = x + params["pos"].astype(jnp.float32)[pos]            # [B, D]
    scale = None
    alpha = None
    kcs, vcs = [], []
    for li, blk in enumerate(params["blocks"]):
        # -- causal self-attention over the cache --------------------- #
        h = _ln(x, blk["ln1_g"], blk["ln1_b"]).astype(compute)
        q = jnp.einsum("bd,dhe->bhe", h, blk["wq"].astype(compute),
                       preferred_element_type=jnp.float32)
        k_new = jnp.einsum("bd,dhe->bhe", h, blk["wk"].astype(compute),
                           preferred_element_type=jnp.float32).reshape(b, -1)
        v_new = jnp.einsum("bd,dhe->bhe", h, blk["wv"].astype(compute),
                           preferred_element_type=jnp.float32).reshape(b, -1)
        kc = jnp.where(write[..., None], k_new[:, None, :],
                       state["kv_k"][:, li])
        vc = jnp.where(write[..., None], v_new[:, None, :],
                       state["kv_v"][:, li])
        kcs.append(kc)
        vcs.append(vc)
        kk = _heads(kc, n_heads)                              # [B, U, H, Dh]
        scale = 1.0 / np.sqrt(q.shape[-1])
        s = jnp.einsum("bhd,buhd->bhu", q.astype(compute),
                       kk.astype(compute),
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(live[:, None, :], s, NEG_INF)
        a = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhu,buhd->bhd", a.astype(compute),
                         _heads(vc, n_heads).astype(compute),
                         preferred_element_type=jnp.float32)
        x = x + jnp.dot(out.reshape(b, -1).astype(compute),
                        blk["wo"].astype(compute),
                        preferred_element_type=jnp.float32)
        # -- cross-attention over the cached encoder projections ------ #
        h = _ln(x, blk["ln2_g"], blk["ln2_b"]).astype(compute)
        q = jnp.einsum("bd,dhe->bhe", h, blk["cq"].astype(compute),
                       preferred_element_type=jnp.float32)
        ck = _heads(cross["ck"][:, li], n_heads)              # [B, T, H, Dh]
        cv = _heads(cross["cv"][:, li], n_heads)
        s = jnp.einsum("bhd,bthd->bht", q.astype(compute),
                       ck.astype(compute),
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(enc_mask[:, None, :], s, NEG_INF)
        a = jax.nn.softmax(s, axis=-1)                        # [B, H, T]
        alpha = jnp.mean(a, axis=1)                           # [B, T]
        out = jnp.einsum("bht,bthd->bhd", a.astype(compute),
                         cv.astype(compute),
                         preferred_element_type=jnp.float32)
        x = x + jnp.dot(out.reshape(b, -1).astype(compute),
                        blk["co"].astype(compute),
                        preferred_element_type=jnp.float32)
        # -- FFN ------------------------------------------------------ #
        h = _ln(x, blk["ln3_g"], blk["ln3_b"]).astype(compute)
        h = jax.nn.gelu(h @ blk["w1"].astype(compute)
                        + blk["b1"].astype(compute))
        x = x + (h @ blk["w2"].astype(compute)).astype(jnp.float32) \
            + blk["b2"].astype(jnp.float32)

    x = _ln(x, params["lnf_g"], params["lnf_b"])
    logits = _output_logits(params, cfg, x)
    new_state = {
        "kv_k": jnp.stack(kcs, axis=1),
        "kv_v": jnp.stack(vcs, axis=1),
        "dpos": pos + 1,
    }
    return new_state, logits, alpha


def _output_logits(params: dict, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    compute = jnp.dtype(cfg.compute_dtype)
    if cfg.tie_embedding:
        w = params["embedding"].T
    else:
        w = params["w_out"]
    return (
        jnp.dot(x.astype(compute), w.astype(compute),
                preferred_element_type=jnp.float32)
        + params["b_out"].astype(jnp.float32)
    )


def forward_teacher(
    params: dict,
    cfg: ModelConfig,
    enc: jax.Array,           # [B, T, enc_out]
    enc_mask: jax.Array,      # [B, T]
    tokens_in: jax.Array,     # [B, U] decoder inputs (starts with <sos>)
    rng: jax.Array | None = None,
    train: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Teacher-forced pass -> (logits [B, U, V], alphas [B, U, T]).

    ONE parallel pass over all U positions — the causal mask replaces the
    LSTM speller's serial scan.  ``train`` + ``cfg.dec_dropout``: dropout
    on each residual branch (attention outputs and FFN), per-site PRNG.
    Step-by-step equivalence with :func:`step` is pinned by
    tests/test_transformer_speller.py."""
    compute = jnp.dtype(cfg.compute_dtype)
    n_heads = cfg.dec_heads
    b, u = tokens_in.shape
    assert u <= cfg.dec_max_len, (
        f"target length {u} exceeds model.dec_max_len {cfg.dec_max_len} — "
        "raise dec_max_len or lower data.token_buckets"
    )
    t = enc.shape[1]
    x = params["embedding"][tokens_in].astype(jnp.float32)
    x = x + params["pos"].astype(jnp.float32)[None, :u]
    causal = jnp.tril(jnp.ones((u, u), bool))
    use_dropout = train and cfg.dec_dropout > 0.0 and rng is not None

    def maybe_dropout(h, i):
        if not use_dropout:
            return h
        k = jax.random.fold_in(rng, i)
        keep = 1.0 - cfg.dec_dropout
        m = jax.random.bernoulli(k, keep, h.shape)
        return jnp.where(m, h / keep, 0.0)

    encc = enc.astype(compute)
    alphas = None
    for li, blk in enumerate(params["blocks"]):
        h = _ln(x, blk["ln1_g"], blk["ln1_b"]).astype(compute)
        q = jnp.einsum("bud,dhe->buhe", h, blk["wq"].astype(compute),
                       preferred_element_type=jnp.float32)
        kk = jnp.einsum("bud,dhe->buhe", h, blk["wk"].astype(compute),
                        preferred_element_type=jnp.float32)
        v = jnp.einsum("bud,dhe->buhe", h, blk["wv"].astype(compute),
                       preferred_element_type=jnp.float32)
        scale = 1.0 / np.sqrt(q.shape[-1])
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(compute),
                       kk.astype(compute),
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(causal[None, None], s, NEG_INF)
        a = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", a.astype(compute),
                         v.astype(compute),
                         preferred_element_type=jnp.float32)
        x = x + maybe_dropout(jnp.dot(
            out.reshape(b, u, -1).astype(compute),
            blk["wo"].astype(compute),
            preferred_element_type=jnp.float32), 3 * li)
        # cross-attention
        h = _ln(x, blk["ln2_g"], blk["ln2_b"]).astype(compute)
        q = jnp.einsum("bud,dhe->buhe", h, blk["cq"].astype(compute),
                       preferred_element_type=jnp.float32)
        ck = jnp.einsum("bte,ehd->bthd", encc, blk["ck"].astype(compute),
                        preferred_element_type=jnp.float32)
        cv = jnp.einsum("bte,ehd->bthd", encc, blk["cv"].astype(compute),
                        preferred_element_type=jnp.float32)
        s = jnp.einsum("bqhd,bthd->bhqt", q.astype(compute),
                       ck.astype(compute),
                       preferred_element_type=jnp.float32) * scale
        s = jnp.where(enc_mask[:, None, None, :], s, NEG_INF)
        a = jax.nn.softmax(s, axis=-1)                        # [B, H, U, T]
        alphas = jnp.mean(a, axis=1)                          # [B, U, T]
        out = jnp.einsum("bhqt,bthd->bqhd", a.astype(compute),
                         cv.astype(compute),
                         preferred_element_type=jnp.float32)
        x = x + maybe_dropout(jnp.dot(
            out.reshape(b, u, -1).astype(compute),
            blk["co"].astype(compute),
            preferred_element_type=jnp.float32), 3 * li + 1)
        # FFN
        h = _ln(x, blk["ln3_g"], blk["ln3_b"]).astype(compute)
        h = jax.nn.gelu(h @ blk["w1"].astype(compute)
                        + blk["b1"].astype(compute))
        x = x + maybe_dropout(
            (h @ blk["w2"].astype(compute)).astype(jnp.float32)
            + blk["b2"].astype(jnp.float32), 3 * li + 2)

    x = _ln(x, params["lnf_g"], params["lnf_b"])
    logits = _output_logits(params, cfg, x)
    if alphas is None:
        alphas = jnp.zeros((b, u, t), jnp.float32)
    return logits, alphas
