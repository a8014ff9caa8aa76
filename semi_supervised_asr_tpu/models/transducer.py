"""RNN-T transducer model family (``model.family: transducer``).

The second decoding paradigm beside LAS: a frame-synchronous,
alignment-free model — no attention over the full encoder output, no
teacher forcing, and a streaming-friendly decode (the predictor sees
only emitted labels; the joint consumes one encoder frame at a time).

* **Encoder**: any listener architecture behind the same dispatch the
  LAS family uses (pBLSTM / transformer / conformer,
  seq2seq._listener_fns) — encoder weights, Pallas kernels, remat, and
  mesh sharding are shared infrastructure.
* **Predictor** (``pred_hidden`` x ``pred_layers``): embedding + uni-
  directional LSTM over [SOS, y_1..y_U]; the input projection of every
  layer is hoisted to one MXU matmul (ops/recurrent.lstm).
* **Joint**: ``tanh(enc @ W_e + pred @ W_p + b) @ W_out`` broadcast over
  the [T', U+1] grid -> logits [B, T', U+1, V].  Blank id = PAD (0),
  matching the CTC convention.  The grid tensor is the memory cost of
  the family: B*T'*(U+1)*max(joint_dim, V) floats — fine at char vocabs
  (default joint_dim 256); at BPE-scale vocabs set
  ``model.joint_chunk_frames`` to compute the loss's V-free lattice
  terms a few frames at a time with rematerialization
  (joint_lattice_terms below — bitwise-equal loss/grads).

Loss: objectives/transducer_loss.py (anti-diagonal scan DP).
Greedy decode: decode/transducer_greedy.py; beam (optional shallow
LSTM-LM fusion, n-best): decode/transducer_beam.py.
Reference counterpart: none — the reference is attention-LAS only
(SURVEY.md §3); capability extension, ``las`` stays the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.data.vocab import SOS
from semi_supervised_asr_tpu.ops import recurrent as R


def init_transducer(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32):
    from semi_supervised_asr_tpu.models.seq2seq import _listener_fns

    k_enc, k_emb, k_pred, k_j1, k_j2, k_j3 = jax.random.split(key, 6)
    enc_init, _ = _listener_fns(cfg)
    glorot = jax.nn.initializers.glorot_uniform()
    pred_layers = []
    in_dim = cfg.embed_dim
    for k in jax.random.split(k_pred, cfg.pred_layers):
        pred_layers.append(R.lstm_init(k, in_dim, cfg.pred_hidden, dtype))
        in_dim = cfg.pred_hidden
    j = cfg.joint_dim
    return {
        "listener": enc_init(k_enc, cfg, dtype),
        "predictor": {
            "embed": (jax.random.normal(k_emb, (cfg.vocab_size,
                                                cfg.embed_dim), dtype)
                      * 0.02),
            "layers": pred_layers,
        },
        "joint": {
            "w_enc": glorot(k_j1, (cfg.enc_out_dim, j), dtype),
            "w_pred": glorot(k_j2, (cfg.pred_hidden, j), dtype),
            "b": jnp.zeros((j,), dtype),
            "w_out": glorot(k_j3, (j, cfg.vocab_size), dtype),
            "b_out": jnp.zeros((cfg.vocab_size,), dtype),
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
    """-> (enc [B, T', 2H] fp32, enc_mask [B, T']) — no attention keys."""
    from semi_supervised_asr_tpu.models.seq2seq import _listener_fns

    _, apply = _listener_fns(cfg)
    if remat:
        apply = jax.checkpoint(apply, static_argnums=(3, 4), policy=None)
    enc, enc_lens = apply(
        params["listener"], feats, feat_lens, cfg, train, dropout_rng
    )
    t = enc.shape[1]
    return enc, jnp.arange(t)[None, :] < enc_lens[:, None]


def predictor_train(
    params: dict, labels: jax.Array, cfg: ModelConfig
) -> jax.Array:
    """Predictor over [SOS, y_1..y_U] -> [B, U+1, pred_hidden].

    Row u is g(y_<u) — the state the joint combines with every encoder
    frame when deciding whether to emit y_{u+1}."""
    b = labels.shape[0]
    compute = jnp.dtype(cfg.compute_dtype)
    toks = jnp.concatenate(
        [jnp.full((b, 1), SOS, labels.dtype), labels], axis=1
    )
    x = params["embed"].astype(jnp.float32)[toks]
    for layer in params["layers"]:
        x = R.lstm(layer, x, compute_dtype=compute)
    return x


def predictor_step(
    params: dict,
    tok: jax.Array,                       # [B] int32
    state: tuple,                         # ((h, c) per layer)
    cfg: ModelConfig,
) -> tuple[jax.Array, tuple]:
    """One decode-time predictor step -> (pred [B, P], new state)."""
    compute = jnp.dtype(cfg.compute_dtype)
    x = params["embed"].astype(jnp.float32)[tok]
    new_state = []
    for layer, (h, c) in zip(params["layers"], state):
        h, c = R.lstm_single_step(layer, x, h, c, compute)
        new_state.append((h, c))
        x = h
    return x, tuple(new_state)


def predictor_init_state(cfg: ModelConfig, b: int) -> tuple:
    z = jnp.zeros((b, cfg.pred_hidden), jnp.float32)
    return tuple((z, z) for _ in range(cfg.pred_layers))


def joint_logits(
    params: dict, enc: jax.Array, pred: jax.Array, cfg: ModelConfig
) -> jax.Array:
    """Full-grid joint: enc [B,T,2H] x pred [B,U1,P] -> [B,T,U1,V]."""
    compute = jnp.dtype(cfg.compute_dtype)
    he = jnp.einsum(
        "bte,ej->btj", enc.astype(compute),
        params["w_enc"].astype(compute),
        preferred_element_type=jnp.float32,
    )
    hp = jnp.einsum(
        "bup,pj->buj", pred.astype(compute),
        params["w_pred"].astype(compute),
        preferred_element_type=jnp.float32,
    )
    h = jnp.tanh(
        he[:, :, None, :] + hp[:, None, :, :]
        + params["b"].astype(jnp.float32)
    )
    return jnp.einsum(
        "btuj,jv->btuv", h.astype(compute),
        params["w_out"].astype(compute),
        preferred_element_type=jnp.float32,
    ) + params["b_out"].astype(jnp.float32)


def joint_lattice_terms(
    params: dict,
    enc: jax.Array,          # [B, T, 2H]
    pred: jax.Array,         # [B, U+1, P]
    labels: jax.Array,       # [B, U]
    cfg: ModelConfig,
    blank: int = 0,
    chunk_frames: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Chunked (blank_lp, emit_lp) [B, T, U+1] — the large-vocab path.

    The full [B, T, U+1, V] joint grid is the transducer family's memory
    cost; the lattice DP only ever consumes two V-free [B, T, U+1]
    tensors (objectives/transducer_loss.lattice_terms).  This computes
    them ``chunk_frames`` encoder frames at a time, so peak live logits
    are [B, chunk, U+1, V]; ``jax.checkpoint`` on the chunk recomputes
    its logits in the backward instead of storing them.  At BPE-scale V
    this turns O(T*V) grid memory into O(chunk*V) — e.g. B=32 T=100
    U=128 V=1024: 13.5 GB -> 1.1 GB at chunk 8.  Enabled by
    ``model.joint_chunk_frames`` (0 = full grid); bitwise-equal losses
    and gradients vs the full grid (tests/test_transducer_loss.py).
    """
    from semi_supervised_asr_tpu.objectives.transducer_loss import (
        lattice_terms,
    )

    b, t, e = enc.shape
    c = max(1, min(int(chunk_frames), t))

    @jax.checkpoint
    def chunk(enc_c):                             # [B, c, 2H]
        logits = joint_logits(params, enc_c, pred, cfg)
        return lattice_terms(logits, labels, blank)

    n = -(-t // c)
    pad = n * c - t
    enc_p = jnp.pad(enc, ((0, 0), (0, pad), (0, 0)))
    chunks = enc_p.reshape(b, n, c, e).swapaxes(0, 1)  # [n, B, c, 2H]
    blank_lp, emit_lp = jax.lax.map(chunk, chunks)     # [n, B, c, U+1]
    u1 = pred.shape[1]

    def unstack(x):
        return x.swapaxes(0, 1).reshape(b, n * c, u1)[:, :t]

    return unstack(blank_lp), unstack(emit_lp)


def joint_row(
    params: dict, enc_t: jax.Array, pred: jax.Array, cfg: ModelConfig
) -> jax.Array:
    """Decode-time joint for ONE (frame, prefix) pair -> [B, V]."""
    compute = jnp.dtype(cfg.compute_dtype)
    he = jnp.dot(
        enc_t.astype(compute), params["w_enc"].astype(compute),
        preferred_element_type=jnp.float32,
    )
    hp = jnp.dot(
        pred.astype(compute), params["w_pred"].astype(compute),
        preferred_element_type=jnp.float32,
    )
    h = jnp.tanh(he + hp + params["b"].astype(jnp.float32))
    return jnp.dot(
        h.astype(compute), params["w_out"].astype(compute),
        preferred_element_type=jnp.float32,
    ) + params["b_out"].astype(jnp.float32)
