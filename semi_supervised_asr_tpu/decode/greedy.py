"""Greedy decoding as a single jit ``lax.scan`` (SURVEY.md §3 #15).

Static ``max_len`` with a done-mask replaces the reference's Python
argmax-until-eos loop; finished rows emit PAD so outputs are directly
CE-maskable (the pseudo-label branch feeds them straight back as targets).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.data.vocab import EOS, PAD, SOS
from semi_supervised_asr_tpu.models import speller as S


def greedy_decode_from_enc(
    speller_params: dict,
    cfg: ModelConfig,
    enc: jax.Array,        # [B, T, enc_out]
    enc_mask: jax.Array,   # [B, T]
    keys: jax.Array,       # [B, T, A] cached key projections
    max_len: int,
) -> tuple[jax.Array, jax.Array]:
    """-> (tokens [B, max_len] (EOS then PADs), logp [B, max_len])."""
    b = enc.shape[0]
    state0 = S.init_state(b, enc.shape[1], cfg, enc_mask,
                          max_steps=max_len)
    tok0 = jnp.full((b,), SOS, jnp.int32)
    done0 = jnp.zeros((b,), bool)

    def step(carry, _):
        state, tok, done = carry
        state, logits, _ = S.speller_step(
            speller_params, cfg, state, tok, keys, enc, enc_mask
        )
        # PAD never continues a live hypothesis (same rule as beam search).
        logits = logits.at[:, PAD].set(-jnp.inf)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt_lp = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        emit = jnp.where(done, PAD, nxt)
        emit_lp = jnp.where(done, 0.0, nxt_lp)
        done = done | (nxt == EOS)
        return (state, emit, done), (emit, emit_lp)

    (_, _, _), (toks, lps) = lax.scan(
        step, (state0, tok0, done0), None, length=max_len
    )
    return toks.swapaxes(0, 1), lps.swapaxes(0, 1)


def greedy_decode(
    params: dict,
    cfg: ModelConfig,
    feats: jax.Array,
    feat_lens: jax.Array,
    max_len: int,
) -> tuple[jax.Array, jax.Array]:
    """Full greedy pass from features (compile once per bucket shape)."""
    from semi_supervised_asr_tpu.models import seq2seq as M

    enc, enc_mask, keys = M.encode(params, feats, feat_lens, cfg)
    return greedy_decode_from_enc(
        params["speller"], cfg, enc, enc_mask, keys, max_len
    )
