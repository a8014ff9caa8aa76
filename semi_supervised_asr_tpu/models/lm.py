"""Language models for shallow fusion in beam search (SURVEY.md §3 #17).

Optional component (reference: "may be absent"): an external char/phone LM
whose per-step logprobs are added to continuation scores during beam search
with weight ``decode.lm_weight`` (shallow fusion — Toshniwal et al. 2018,
arXiv:1807.10857, the retrieved comparison paper).  Trainable on the
unlabeled TEXT stream.

Two architectures behind ONE interface (``lm.arch``): the LSTM LM and a
pre-LN causal Transformer LM with a per-step KV cache.  ``lm_step`` /
``lm_forward`` / ``lm_loss`` dispatch on the param tree ("blocks" marks
the transformer), so the trainer, Solver, and beam need no wiring changes.

The step interface matches decode/beam.py's ``lm_step_fn`` contract:
    lm_step_fn(params, None,  None, init_batch=B) -> (state0, None)
    lm_step_fn(params, state, tokens)             -> (state',  logits)
Every state leaf carries the lattice row on axis 1 with a leading
layer/stack axis (LSTM h/c: [L, B, H]; transformer KV: [L, B, T, D],
position: [1, B]), so the beam's gather-reorder works on all of them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.ops import recurrent as R


def init_lm(
    key: jax.Array,
    vocab_size: int,
    embed_dim: int = 128,
    hidden: int = 256,
    layers: int = 1,
    dtype=jnp.float32,
):
    k_emb, k_out, *k_cells = jax.random.split(key, 2 + layers)
    cells = []
    in_dim = embed_dim
    for i in range(layers):
        cells.append(R.lstm_init(k_cells[i], in_dim, hidden, dtype))
        in_dim = hidden
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "embedding": jax.random.normal(k_emb, (vocab_size, embed_dim), dtype)
        * (1.0 / jnp.sqrt(jnp.float32(embed_dim))),
        "cells": cells,
        "w_out": glorot(k_out, (hidden, vocab_size), dtype),
        "b_out": jnp.zeros((vocab_size,), dtype),
    }


def lm_init_state(params: dict, batch: int) -> dict:
    layers = len(params["cells"])
    hidden = params["cells"][0]["w_hh"].shape[0]
    return {
        "h": jnp.zeros((layers, batch, hidden), jnp.float32),
        "c": jnp.zeros((layers, batch, hidden), jnp.float32),
    }


def lm_step(
    params: dict,
    state: dict | None,
    tokens: jax.Array | None,
    init_batch: int | None = None,
) -> tuple[dict, jax.Array | None]:
    """Beam-compatible step (see module docstring for the contract)."""
    if "blocks" in params:
        return transformer_lm_step(params, state, tokens, init_batch)
    if state is None:
        assert init_batch is not None
        return lm_init_state(params, init_batch), None
    x = params["embedding"][tokens].astype(jnp.float32)
    hs, cs = [], []
    for i, cell in enumerate(params["cells"]):
        h, c = R.lstm_single_step(cell, x, state["h"][i], state["c"][i])
        hs.append(h)
        cs.append(c)
        x = h
    logits = (
        jnp.dot(x, params["w_out"], preferred_element_type=jnp.float32)
        + params["b_out"]
    )
    return {"h": jnp.stack(hs), "c": jnp.stack(cs)}, logits


def lm_forward(params: dict, tokens_in: jax.Array) -> jax.Array:
    """Teacher-forced LM pass over [B, U] -> logits [B, U, V] (training).

    Input embeddings for all steps are gathered up front; the scan carries
    only the recurrent matmuls (same hoisting as ops/recurrent.lstm).
    """
    if "blocks" in params:
        return transformer_lm_forward(params, tokens_in)
    b, u = tokens_in.shape
    state = lm_init_state(params, b)
    emb = params["embedding"][tokens_in].astype(jnp.float32)  # [B,U,E]

    def step(state, x_t):
        hs, cs = [], []
        x = x_t
        for i, cell in enumerate(params["cells"]):
            h, c = R.lstm_single_step(cell, x, state["h"][i], state["c"][i])
            hs.append(h)
            cs.append(c)
            x = h
        logits = (
            jnp.dot(x, params["w_out"], preferred_element_type=jnp.float32)
            + params["b_out"]
        )
        return {"h": jnp.stack(hs), "c": jnp.stack(cs)}, logits

    _, logits = jax.lax.scan(step, state, jnp.swapaxes(emb, 0, 1))
    return jnp.swapaxes(logits, 0, 1)


def lm_loss(params: dict, tokens: jax.Array) -> jax.Array:
    """Next-token CE on EOS-terminated, PAD-padded text batches."""
    from semi_supervised_asr_tpu.objectives.losses import masked_ce, shift_targets

    tokens_in, targets = shift_targets(tokens)
    logits = lm_forward(params, tokens_in)
    loss, _ = masked_ce(logits, targets)
    return loss


# --------------------------------------------------------------------- #
# Transformer LM (lm.arch: transformer)
# --------------------------------------------------------------------- #

NEG_INF = -1e30


def init_transformer_lm(
    key: jax.Array,
    vocab_size: int,
    d_model: int = 128,
    layers: int = 2,
    heads: int = 4,
    d_ff: int = 512,
    max_len: int = 256,
    dtype=jnp.float32,
):
    """Pre-LN causal transformer LM; ``max_len`` bounds the KV cache (and
    therefore the longest sequence it can score — decode.max_decode_len
    must not exceed it)."""
    assert d_model % heads == 0, (d_model, heads)
    dh = d_model // heads
    keys = jax.random.split(key, 3 + 6 * layers)
    glorot = jax.nn.initializers.glorot_uniform()

    def qkv(k):
        # stored [D, H, Dh]: the head count lives in the SHAPE, so the
        # step fn needs no config (orbax/optax trees stay array-only)
        return glorot(k, (d_model, d_model), dtype).reshape(
            d_model, heads, dh
        )

    blocks = []
    for i in range(layers):
        k = keys[3 + 6 * i : 3 + 6 * (i + 1)]
        blocks.append({
            "ln1_g": jnp.ones((d_model,), dtype),
            "ln1_b": jnp.zeros((d_model,), dtype),
            "wq": qkv(k[0]),
            "wk": qkv(k[1]),
            "wv": qkv(k[2]),
            "wo": glorot(k[3], (d_model, d_model), dtype),
            "ln2_g": jnp.ones((d_model,), dtype),
            "ln2_b": jnp.zeros((d_model,), dtype),
            "w1": glorot(k[4], (d_model, d_ff), dtype),
            "b1": jnp.zeros((d_ff,), dtype),
            "w2": glorot(k[5], (d_ff, d_model), dtype),
            "b2": jnp.zeros((d_model,), dtype),
        })
    return {
        "embedding": jax.random.normal(
            keys[0], (vocab_size, d_model), dtype
        ) * (1.0 / jnp.sqrt(jnp.float32(d_model))),
        "pos": jax.random.normal(keys[1], (max_len, d_model), dtype) * 0.02,
        "blocks": blocks,
        "lnf_g": jnp.ones((d_model,), dtype),
        "lnf_b": jnp.zeros((d_model,), dtype),
        "w_out": glorot(keys[2], (d_model, vocab_size), dtype),
        "b_out": jnp.zeros((vocab_size,), dtype),
    }


def _ln(x, g, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + b


def _heads(x, n):          # [..., D] -> [..., n, D/n]
    return x.reshape(x.shape[:-1] + (n, x.shape[-1] // n))


def transformer_lm_forward(params: dict, tokens_in: jax.Array) -> jax.Array:
    """Teacher-forced causal pass [B, U] -> [B, U, V] (training path)."""
    b, u = tokens_in.shape
    x = params["embedding"][tokens_in].astype(jnp.float32)
    x = x + params["pos"][:u].astype(jnp.float32)[None]
    causal = jnp.tril(jnp.ones((u, u), bool))
    for blk in params["blocks"]:
        h = _ln(x, blk["ln1_g"], blk["ln1_b"])
        q = jnp.einsum("bud,dhe->buhe", h, blk["wq"])   # [B, U, H, Dh]
        kk = jnp.einsum("bud,dhe->buhe", h, blk["wk"])
        v = jnp.einsum("bud,dhe->buhe", h, blk["wv"])
        scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, kk) * scale
        scores = jnp.where(causal[None, None], scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        x = x + out.reshape(b, u, -1) @ blk["wo"]
        h2 = _ln(x, blk["ln2_g"], blk["ln2_b"])
        x = x + jax.nn.gelu(h2 @ blk["w1"] + blk["b1"]) @ blk["w2"] + blk["b2"]
    x = _ln(x, params["lnf_g"], params["lnf_b"])
    return x @ params["w_out"] + params["b_out"]


def transformer_lm_step(
    params: dict,
    state: dict | None,
    tokens: jax.Array | None,
    init_batch: int | None = None,
) -> tuple[dict, jax.Array | None]:
    """Beam-compatible incremental step with a [L, B, T, D] KV cache.

    Positions are PER ROW (``tpos`` [1, B]): label-synchronous callers
    (the LAS beam) advance every row each step, alignment-synchronous
    ones (the transducer beam) advance only emitting hypotheses — the
    KV write and causal mask follow each row's own depth."""
    layers = len(params["blocks"])
    d_model = params["blocks"][0]["wq"].shape[0]
    t_max = params["pos"].shape[0]
    if state is None:
        assert init_batch is not None
        return {
            "kc": jnp.zeros((layers, init_batch, t_max, d_model),
                            jnp.float32),
            "vc": jnp.zeros((layers, init_batch, t_max, d_model),
                            jnp.float32),
            "tpos": jnp.zeros((1, init_batch), jnp.int32),
        }, None

    b = tokens.shape[0]
    # PER-ROW positions: rows may sit at different depths (the transducer
    # beam's hypotheses emit different label counts per frame); the LAS
    # beam's uniform positions are the special case where all rows match
    pos = state["tpos"][0]                          # [B]
    write = (jnp.arange(t_max)[None, :] == pos[:, None])      # [B, T]
    x = params["embedding"][tokens].astype(jnp.float32)
    x = x + params["pos"].astype(jnp.float32)[pos]            # [B, D]
    kcs, vcs = [], []
    live = jnp.arange(t_max)[None, :] <= pos[:, None]         # [B, T]
    for li, blk in enumerate(params["blocks"]):
        n_heads = blk["wq"].shape[1]
        h = _ln(x, blk["ln1_g"], blk["ln1_b"])
        q = jnp.einsum("bd,dhe->bhe", h, blk["wq"])     # [B, H, Dh]
        k_new = jnp.einsum("bd,dhe->bhe", h, blk["wk"]).reshape(b, -1)
        v_new = jnp.einsum("bd,dhe->bhe", h, blk["wv"]).reshape(b, -1)
        kc = jnp.where(
            write[..., None], k_new[:, None, :], state["kc"][li]
        )
        vc = jnp.where(
            write[..., None], v_new[:, None, :], state["vc"][li]
        )
        kcs.append(kc)
        vcs.append(vc)
        kk = _heads(kc, n_heads)                    # [B, T, H, Dh]
        v = _heads(vc, n_heads)
        scale = 1.0 / jnp.sqrt(jnp.float32(q.shape[-1]))
        scores = jnp.einsum("bhd,bkhd->bhk", q, kk) * scale
        scores = jnp.where(live[:, None, :], scores, NEG_INF)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhk,bkhd->bhd", attn, v)
        x = x + out.reshape(b, -1) @ blk["wo"]
        h2 = _ln(x, blk["ln2_g"], blk["ln2_b"])
        x = x + jax.nn.gelu(h2 @ blk["w1"] + blk["b1"]) @ blk["w2"] + blk["b2"]
    x = _ln(x, params["lnf_g"], params["lnf_b"])
    logits = x @ params["w_out"] + params["b_out"]
    new_state = {
        "kc": jnp.stack(kcs),
        "vc": jnp.stack(vcs),
        "tpos": state["tpos"] + 1,
    }
    return new_state, logits
