"""Speller: attention LSTM decoder with scheduled sampling (SURVEY.md §3 #10).

One shared :func:`speller_step` drives everything that decodes:
* teacher-forced training (``forward_teacher`` — a single ``lax.scan`` over
  U steps carrying (LSTM states, context, alpha), SURVEY.md §4.1),
* greedy decoding, batched beam search (decode/*.py) — the beam simply
  vmaps/reshapes the same step over [B*K] lattice rows, and
* the text autoencoder (objectives/losses.py) reuses the module with a
  zeroed context, sharing embedding/LSTM/projection weights
  (BASELINE.json:5 text-AE weight sharing).

The decoder state is a flat dict of arrays whose leading axis is the
lattice row, so beam reordering is one ``jnp.take_along_axis`` per leaf.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.models import attention as A
from semi_supervised_asr_tpu.ops import recurrent as R


def _fusion_extra_dim(cfg: ModelConfig) -> int:
    """Width the LM-fusion feature adds to the output-projection input."""
    if cfg.lm_fusion == "deep":
        return cfg.lm_fusion_hidden
    if cfg.lm_fusion == "cold":
        return cfg.lm_fusion_dim
    return 0


def init_speller(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32):
    if cfg.decoder_arch == "transformer":
        from semi_supervised_asr_tpu.models import transformer_speller as TS

        assert cfg.lm_fusion == "none", (
            "deep/cold LM fusion is wired into the LSTM speller's step; "
            "with decoder_arch=transformer use SHALLOW fusion at decode "
            "time (decode.lm_weight)"
        )
        return TS.init_transformer_speller(key, cfg, dtype)
    assert cfg.decoder_arch == "lstm", cfg.decoder_arch
    k_emb, k_att, k_out, k_fus, *k_lstm = jax.random.split(
        key, 4 + cfg.dec_layers
    )
    emb_scale = 1.0 / jnp.sqrt(jnp.float32(cfg.embed_dim))
    cells = []
    in_dim = cfg.embed_dim + cfg.enc_out_dim
    for i in range(cfg.dec_layers):
        cells.append(R.lstm_init(k_lstm[i], in_dim, cfg.dec_hidden, dtype))
        in_dim = cfg.dec_hidden
    glorot = jax.nn.initializers.glorot_uniform()
    params = {
        "embedding": (
            jax.random.normal(k_emb, (cfg.vocab_size, cfg.embed_dim), dtype)
            * emb_scale
        ),
        "cells": cells,
        "attention": A.init_attention(k_att, cfg, dtype),
        "b_out": jnp.zeros((cfg.vocab_size,), dtype),
    }
    out_in_dim = cfg.dec_hidden + cfg.enc_out_dim + _fusion_extra_dim(cfg)
    if cfg.tie_embedding:
        # tied softmax: project to embed_dim, score against embedding^T
        params["w_tie"] = glorot(k_out, (out_in_dim, cfg.embed_dim), dtype)
    else:
        params["w_out"] = glorot(k_out, (out_in_dim, cfg.vocab_size), dtype)
    if cfg.lm_fusion != "none":
        from semi_supervised_asr_tpu.models import lm as LM

        k_lm, k_g, k_l = jax.random.split(k_fus, 3)
        base = cfg.dec_hidden + cfg.enc_out_dim
        if cfg.lm_fusion == "deep":
            fusion = {
                "w_g": glorot(k_g, (cfg.lm_fusion_hidden, 1), dtype),
                "b_g": jnp.zeros((1,), dtype),
            }
        elif cfg.lm_fusion == "cold":
            fusion = {
                "w_l": glorot(k_l, (cfg.vocab_size, cfg.lm_fusion_dim),
                              dtype),
                "b_l": jnp.zeros((cfg.lm_fusion_dim,), dtype),
                "w_g": glorot(
                    k_g, (base + cfg.lm_fusion_dim, cfg.lm_fusion_dim), dtype
                ),
                "b_g": jnp.zeros((cfg.lm_fusion_dim,), dtype),
            }
        else:
            raise ValueError(f"unknown lm_fusion {cfg.lm_fusion!r}")
        params["fusion"] = fusion
        # placeholder frozen LM — replaced by attach_fusion_lm with a
        # trained lm_trainer checkpoint (Solver does this at startup)
        params["fusion_lm"] = LM.init_lm(
            k_lm, cfg.vocab_size, cfg.lm_fusion_embed,
            cfg.lm_fusion_hidden, cfg.lm_fusion_layers, dtype,
        )
    return params


def attach_fusion_lm(speller_params: dict, lm_params: dict) -> dict:
    """Graft a trained LM into the speller tree (shape-checked)."""
    assert "fusion_lm" in speller_params, "model.lm_fusion is off"
    old = speller_params["fusion_lm"]
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(old),
        jax.tree_util.tree_leaves_with_path(lm_params),
    ):
        assert a.shape == b.shape, (
            f"fusion LM mismatch at {jax.tree_util.keystr(pa)}: "
            f"{a.shape} vs {b.shape} — model.lm_fusion_* must match the "
            "trained LM's architecture"
        )
    return dict(speller_params, fusion_lm=lm_params)


def precompute_decode_cache(params: dict, cfg: ModelConfig, enc: jax.Array):
    """Per-utterance decode cache computed ONCE from the encoder outputs
    (the "cached encoder states" of config C3, BASELINE.json:9) — tiled to
    lattice rows by the beam, never reordered.

    LSTM speller: the attention key projections [B, T, A] (an array).
    Transformer speller: per-layer cross-attention K/V projections (a
    dict pytree, row axis 0) — consumers tile/convert with jax.tree.map.
    """
    if cfg.decoder_arch == "transformer":
        from semi_supervised_asr_tpu.models import transformer_speller as TS

        return TS.precompute_cross(params, cfg, enc)
    return A.precompute_keys(params["attention"], enc)


def init_state(batch: int, t_enc: int, cfg: ModelConfig, mask: jax.Array,
               max_steps: int | None = None):
    """Fresh decoder state for `batch` lattice rows over `t_enc` frames.

    ``max_steps`` (the decode loop length) is required by the transformer
    speller (it sizes the KV cache); the LSTM speller's state is
    step-count-free and ignores it."""
    if cfg.decoder_arch == "transformer":
        from semi_supervised_asr_tpu.models import transformer_speller as TS

        assert max_steps is not None, (
            "decoder_arch=transformer needs max_steps to size the KV cache"
        )
        return TS.init_state(batch, cfg, max_steps)
    state = {
        "h": jnp.zeros((cfg.dec_layers, batch, cfg.dec_hidden), jnp.float32),
        "c": jnp.zeros((cfg.dec_layers, batch, cfg.dec_hidden), jnp.float32),
        "context": jnp.zeros((batch, cfg.enc_out_dim), jnp.float32),
        "alpha": A.initial_alpha(mask),
    }
    if cfg.lm_fusion != "none":
        lm_shape = (cfg.lm_fusion_layers, batch, cfg.lm_fusion_hidden)
        state["lm_h"] = jnp.zeros(lm_shape, jnp.float32)
        state["lm_c"] = jnp.zeros(lm_shape, jnp.float32)
    return state


def speller_step(
    params: dict,
    cfg: ModelConfig,
    state: dict,
    tokens: jax.Array,       # [B*] int32 previous tokens
    keys: jax.Array,         # [B*, T, A] cached key projections
    values: jax.Array,       # [B*, T, enc_out] encoder outputs
    mask: jax.Array,         # [B*, T] valid-frame mask
    dropout_rng: jax.Array | None = None,
    perts: dict | None = None,
    save_linear: bool = False,
) -> tuple[dict, jax.Array, jax.Array] | tuple[dict, jax.Array, jax.Array, dict]:
    """-> (new_state, logits [B*, V], alpha [B*, T]).

    ``dropout_rng`` (training only): dropout at rate ``cfg.dec_dropout``
    on the [h_top, context] concat feeding the output projection.

    ``perts`` / ``save_linear`` serve the stacked-dW backward
    (:func:`_stacked_scan`): ``perts`` injects zero-valued additive
    perturbations at the big linear sites ({"gates": [per-layer [B,4H]],
    "ctx": [B,enc_out], "logit": [B,V]}) whose cotangents are the
    per-step gradients those sites would otherwise accumulate across the
    scan; ``save_linear`` additionally returns the matmul left-operands
    ({"x{i}", "h{i}", "out_in"} in compute dtype) needed to contract
    those cotangents into weight gradients.
    """
    if cfg.decoder_arch == "transformer":
        from semi_supervised_asr_tpu.models import transformer_speller as TS

        assert perts is None and not save_linear, (
            "the stacked-dW backward is LSTM-speller-only"
        )
        return TS.step(params, cfg, state, tokens, keys, mask)
    compute = jnp.dtype(cfg.compute_dtype)
    emb = params["embedding"][tokens].astype(jnp.float32)
    x = jnp.concatenate([emb, state["context"]], axis=-1)

    saves = {}
    hs, cs = [], []
    for i in range(cfg.dec_layers):
        if save_linear:
            saves[f"x{i}"] = x.astype(compute)
            saves[f"h{i}"] = state["h"][i].astype(compute)
        h, c = R.lstm_single_step(
            params["cells"][i], x, state["h"][i], state["c"][i], compute,
            gate_pert=None if perts is None else perts["gates"][i],
        )
        hs.append(h)
        cs.append(c)
        x = h
    h_top = hs[-1]

    context, alpha = A.attend(
        params["attention"], h_top, state["alpha"], keys, values, mask,
        cfg.attn_sharpening,
    )
    if perts is not None:
        context = context + perts["ctx"]
    out_in = jnp.concatenate([h_top, context], axis=-1)
    if dropout_rng is not None and cfg.dec_dropout > 0.0:
        keep = 1.0 - cfg.dec_dropout
        m = jax.random.bernoulli(dropout_rng, keep, out_in.shape)
        out_in = jnp.where(m, out_in / keep, 0.0)

    lm_leaves = {}
    if cfg.lm_fusion != "none":
        from semi_supervised_asr_tpu.models import lm as LM

        # the LM is FROZEN: gradients flow through the fusion gate/DNN
        # into the trainable speller only, never into the LM
        lmp = jax.tree.map(lax.stop_gradient, params["fusion_lm"])
        lm_state, lm_logits = LM.lm_step(
            lmp, {"h": state["lm_h"], "c": state["lm_c"]}, tokens
        )
        fus = params["fusion"]
        if cfg.lm_fusion == "deep":
            # Gulcehre et al. 2015: scalar gate on the LM's top hidden
            s_lm = lm_state["h"][-1]
            g = jax.nn.sigmoid(
                jnp.dot(s_lm, fus["w_g"].astype(jnp.float32)) + fus["b_g"]
            )
            extra = g * s_lm
        else:
            # Sriram et al. 2017 cold fusion: DNN over LM logits, then a
            # fine-grained gate conditioned on the decoder state
            h_lm = jax.nn.relu(
                jnp.dot(lm_logits, fus["w_l"].astype(jnp.float32))
                + fus["b_l"]
            )
            g = jax.nn.sigmoid(
                jnp.dot(
                    jnp.concatenate([out_in, h_lm], axis=-1),
                    fus["w_g"].astype(jnp.float32),
                )
                + fus["b_g"]
            )
            extra = g * h_lm
        out_in = jnp.concatenate([out_in, extra], axis=-1)
        lm_leaves = {"lm_h": lm_state["h"], "lm_c": lm_state["c"]}

    if cfg.tie_embedding:
        proj = jnp.dot(
            out_in.astype(compute),
            params["w_tie"].astype(compute),
            preferred_element_type=jnp.float32,
        )
        logits = (
            jnp.dot(
                proj.astype(compute),
                params["embedding"].T.astype(compute),
                preferred_element_type=jnp.float32,
            )
            + params["b_out"].astype(jnp.float32)
        )
    else:
        if save_linear:
            saves["out_in"] = out_in.astype(compute)
        logits = (
            jnp.dot(
                out_in.astype(compute),
                params["w_out"].astype(compute),
                preferred_element_type=jnp.float32,
            )
            + params["b_out"].astype(jnp.float32)
        )
        if perts is not None and "logit" in perts:
            logits = logits + perts["logit"]
    new_state = {
        "h": jnp.stack(hs),
        "c": jnp.stack(cs),
        "context": context,
        "alpha": alpha,
        **lm_leaves,
    }
    if save_linear:
        return new_state, logits, alpha, saves
    return new_state, logits, alpha


@lru_cache(maxsize=None)
def _stacked_scan(cfg: ModelConfig, use_dropout: bool):
    """Teacher-forcing scan with a stacked-dW custom VJP.

    Plain ``lax.scan`` autodiff transposes the decode loop into a reverse
    scan whose carry includes a gradient ACCUMULATOR for every weight
    used inside the loop — at ls960 dims that is ~38MB of decoder cell
    dW plus the [B,T,enc_out] d(enc) partial, re-read and re-written
    from HBM on every one of the U backward steps (pure bandwidth, no
    MXU work).  This wrapper reroutes those gradients:

    * the decoder cell weights, ``w_out``, and the attention *values*
      (the encoder outputs) are held constant (``stop_gradient``) inside
      the scan;
    * zero-valued perturbations are injected at each of those linear
      sites (:func:`speller_step` ``perts``), so the scan's vjp emits
      the per-step site cotangents STACKED over time instead of
      accumulated — the reverse scan's carry shrinks to the state
      adjoints (the irreducible serial chain);
    * the weight gradients are reconstructed afterwards as single MXU
      contractions over the stacked (saved left-operand, cotangent)
      pairs — e.g. ``dW_ih = einsum('ubi,ubz->iz', xs, d_gates)`` — and
      ``d(enc) = einsum('ubt,ube->bte', alphas, d_context)``.

    Gradients are mathematically identical to the scan path (the only
    difference is summation order); parity is tested in
    tests/test_stacked_grad.py.  Everything *small* (attention MLP,
    biases, embedding lookup, fusion gates, tied projections) stays on
    ordinary autodiff — their accumulators are KBs, not MBs.

    The factory is cached per (cfg, use_dropout); cfg is a frozen
    (hashable) dataclass, so each model shape builds its vjp once.
    """
    n_layers, tied = cfg.dec_layers, cfg.tie_embedding

    def _select(prev_logits, tok_gt, k, tf_rate, b):
        use_gt = jax.random.bernoulli(k, tf_rate, (b,))
        sampled = jnp.argmax(prev_logits, axis=-1).astype(tok_gt.dtype)
        return jnp.where(use_gt, tok_gt, sampled)

    def _plain(rest, cells, values, keys, state0, logits0, toks, rngs,
               mask, tf_rate):
        params = dict(rest, cells=cells)
        b = logits0.shape[0]

        def step(carry, inp):
            state, prev_logits = carry
            tok_gt, k = inp
            tok = _select(prev_logits, tok_gt, k, tf_rate, b)
            drop = jax.random.fold_in(k, 1) if use_dropout else None
            state, logits, alpha = speller_step(
                params, cfg, state, tok, keys, values, mask,
                dropout_rng=drop,
            )
            return (state, logits), (logits, alpha)

        (_, _), (lr, ar) = lax.scan(step, (state0, logits0), (toks, rngs),
                                    unroll=cfg.speller_unroll)
        return lr, ar

    spell = jax.custom_vjp(_plain)

    def _fwd(rest, cells, values, keys, state0, logits0, toks, rngs,
             mask, tf_rate):
        u1 = toks.shape[0]
        b = logits0.shape[0]
        vocab = logits0.shape[-1]
        pg = tuple(
            jnp.zeros((u1, b, 4 * cfg.dec_hidden), jnp.float32)
            for _ in range(n_layers)
        )
        pc = jnp.zeros((u1, b, cfg.enc_out_dim), jnp.float32)
        pl = None if tied else jnp.zeros((u1, b, vocab), jnp.float32)
        cells_c = jax.tree.map(lax.stop_gradient, cells)
        vals_c = lax.stop_gradient(values)

        def run(rest_, keys_, state0_, logits0_, pg_, pc_, pl_):
            if not tied:
                rest_ = dict(rest_, w_out=lax.stop_gradient(rest_["w_out"]))
            params = dict(rest_, cells=cells_c)

            def step(carry, inp):
                state, prev_logits = carry
                tok_gt, k, pg_u, pc_u, pl_u = inp
                tok = _select(prev_logits, tok_gt, k, tf_rate, b)
                drop = jax.random.fold_in(k, 1) if use_dropout else None
                perts = {"gates": pg_u, "ctx": pc_u}
                if pl_u is not None:
                    perts["logit"] = pl_u
                state, logits, alpha, saves = speller_step(
                    params, cfg, state, tok, keys_, vals_c, mask,
                    dropout_rng=drop, perts=perts, save_linear=True,
                )
                return (state, logits), (logits, alpha, saves)

            (_, _), (lr, ar, saves) = lax.scan(
                step, (state0_, logits0_), (toks, rngs, pg_, pc_, pl_),
                unroll=cfg.speller_unroll,
            )
            return lr, ar, saves

        (lr, ar, saves), pull = jax.vjp(
            run, rest, keys, state0, logits0, pg, pc, pl
        )
        return (lr, ar), (pull, saves, ar, cells, values, toks, rngs, mask)

    def _bwd(res, g):
        pull, saves, ar, cells, values, toks, rngs, mask = res
        g_lr, g_ar = g
        zsaves = jax.tree.map(jnp.zeros_like, saves)
        drest, dkeys, dstate0, dlogits0, dpg, dpc, dpl = pull(
            (g_lr, g_ar, zsaves)
        )
        compute = jnp.dtype(cfg.compute_dtype)
        dcells = []
        for i in range(n_layers):
            dz = dpg[i].astype(compute)
            w = cells[i]
            dcells.append({
                "w_ih": jnp.einsum(
                    "ubi,ubz->iz", saves[f"x{i}"], dz,
                    preferred_element_type=jnp.float32,
                ).astype(w["w_ih"].dtype),
                "w_hh": jnp.einsum(
                    "ubh,ubz->hz", saves[f"h{i}"], dz,
                    preferred_element_type=jnp.float32,
                ).astype(w["w_hh"].dtype),
                "b": dpg[i].sum((0, 1)).astype(w["b"].dtype),
            })
        dvalues = jnp.einsum(
            "ubt,ube->bte", ar, dpc, preferred_element_type=jnp.float32
        ).astype(values.dtype)
        if not tied:
            dwout = jnp.einsum(
                "ube,ubv->ev", saves["out_in"], dpl.astype(compute),
                preferred_element_type=jnp.float32,
            ).astype(drest["w_out"].dtype)
            drest = dict(drest, w_out=dwout)

        def f0(a):
            return np.zeros(a.shape, jax.dtypes.float0)

        return (drest, dcells, dvalues, dkeys, dstate0, dlogits0,
                f0(toks), f0(rngs), f0(mask),
                jnp.zeros((), jnp.float32))

    spell.defvjp(_fwd, _bwd)
    return spell


def forward_teacher(
    params: dict,
    cfg: ModelConfig,
    enc: jax.Array,           # [B, T, enc_out]
    enc_mask: jax.Array,      # [B, T]
    tokens_in: jax.Array,     # [B, U] decoder inputs (starts with <sos>)
    tf_rate: jax.Array | float = 1.0,
    rng: jax.Array | None = None,
    train: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Teacher-forced decode -> (logits [B, U, V], alphas [B, U, T]).

    Scheduled sampling: at each step (after the first) the input token is
    the ground truth with probability ``tf_rate``, else the argmax of the
    previous step's logits — sampled per (step, batch element) under the
    jax PRNG, entirely inside the scan.

    ``train`` + ``cfg.dec_dropout``: per-step dropout on the top LSTM
    output before the output projection (in-scan, per-step PRNG).

    decoder_arch=transformer: ONE parallel causal pass (no scan);
    ``tf_rate`` is ignored — scheduled sampling is incompatible with the
    parallel pass, and training/train_step.py asserts the schedule is
    pinned at 1.0 for this arch.
    """
    if cfg.decoder_arch == "transformer":
        from semi_supervised_asr_tpu.models import transformer_speller as TS

        return TS.forward_teacher(
            params, cfg, enc, enc_mask, tokens_in, rng, train
        )
    b, u = tokens_in.shape
    keys_proj = A.precompute_keys(params["attention"], enc)
    state0 = init_state(b, enc.shape[1], cfg, enc_mask)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    step_rngs = jax.random.split(rng, u)
    tf_rate = jnp.asarray(tf_rate, jnp.float32)
    use_dropout = train and cfg.dec_dropout > 0.0

    def step(carry, inp):
        state, prev_logits = carry
        tok_gt, k = inp
        use_gt = jax.random.bernoulli(k, tf_rate, (b,))
        sampled = jnp.argmax(prev_logits, axis=-1).astype(tok_gt.dtype)
        tok = jnp.where(use_gt, tok_gt, sampled)
        drop_rng = jax.random.fold_in(k, 1) if use_dropout else None
        state, logits, alpha = speller_step(
            params, cfg, state, tok, keys_proj, enc, enc_mask,
            dropout_rng=drop_rng,
        )
        return (state, logits), (logits, alpha)

    # Step 0 runs outside the scan: its input is always the ground-truth
    # <sos>, and it seeds prev_logits for the scheduled-sampling scan.
    state, logits0, alpha0 = speller_step(
        params, cfg, state0, tokens_in[:, 0], keys_proj, enc, enc_mask,
        dropout_rng=(jax.random.fold_in(step_rngs[0], 1)
                     if use_dropout else None),
    )
    if u == 1:
        return logits0[:, None], alpha0[:, None]

    assert cfg.speller_grad in ("scan", "stacked"), cfg.speller_grad
    if cfg.speller_grad == "stacked":
        spell = _stacked_scan(cfg, use_dropout)
        rest = {k: v for k, v in params.items() if k != "cells"}
        logits_rest, alpha_rest = spell(
            rest, params["cells"], enc, keys_proj, state, logits0,
            tokens_in[:, 1:].swapaxes(0, 1), step_rngs[1:], enc_mask,
            tf_rate,
        )
        logits_rest = logits_rest.swapaxes(0, 1)
        alpha_rest = alpha_rest.swapaxes(0, 1)
        logits = jnp.concatenate([logits0[:, None], logits_rest], axis=1)
        alphas = jnp.concatenate([alpha0[:, None], alpha_rest], axis=1)
        return logits, alphas

    (_, _), (logits_rest, alpha_rest) = lax.scan(
        step,
        (state, logits0),
        (tokens_in[:, 1:].swapaxes(0, 1), step_rngs[1:]),
        unroll=cfg.speller_unroll,
    )
    logits = jnp.concatenate(
        [logits0[:, None], logits_rest.swapaxes(0, 1)], axis=1
    )
    alphas = jnp.concatenate(
        [alpha0[:, None], alpha_rest.swapaxes(0, 1)], axis=1
    )
    return logits, alphas


def text_autoencoder_logits(
    params: dict,
    cfg: ModelConfig,
    tokens_in: jax.Array,     # [B, U] (<sos>-led)
) -> jax.Array:
    """Text-AE branch: run the speller as an LM over text with no audio.

    Shares embedding/LSTM/output weights with the ASR speller (same param
    pytree — SURVEY.md §3 #13 "shares weights").  The attention context is
    a constant zero (a single zero 'frame' is attended, contributing a
    zero context vector), so gradients flow only through the shared
    decoder parameters.
    """
    b, u = tokens_in.shape
    enc = jnp.zeros((b, 1, cfg.enc_out_dim), jnp.float32)
    mask = jnp.ones((b, 1), bool)
    logits, _ = forward_teacher(
        params, cfg, enc, mask, tokens_in, tf_rate=1.0,
        rng=jax.random.PRNGKey(0),
    )
    return logits
