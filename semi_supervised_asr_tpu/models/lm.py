"""LSTM language model for shallow fusion in beam search (SURVEY.md §3 #17).

Optional component (reference: "may be absent"): an external char/phone LM
whose per-step logprobs are added to continuation scores during beam search
with weight ``decode.lm_weight`` (shallow fusion — Toshniwal et al. 2018,
arXiv:1807.10857, the retrieved comparison paper).  Trainable on the
unlabeled TEXT stream.

The step interface matches decode/beam.py's ``lm_step_fn`` contract:
    lm_step_fn(params, None,  None, init_batch=B) -> (state0, None)
    lm_step_fn(params, state, tokens)             -> (state',  logits)
State leaves carry the lattice row on axis 0 ('h'/'c' on axis 1), so the
beam's gather-reorder works on them like on decoder state.
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
