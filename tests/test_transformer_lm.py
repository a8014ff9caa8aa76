"""Transformer LM (lm.arch: transformer): pre-LN causal decoder with a
KV-cache step behind the same lm_step/lm_forward/lm_loss interface as the
LSTM LM.

The load-bearing check is forward-vs-step consistency: teacher-forced
logits must equal the sequential KV-cache step's logits position by
position — that is exactly the cache-correctness property fusion relies
on.  Plus: causality, trainability, beam fusion behavior, and the trainer
round-trip.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_asr_tpu.data.vocab import EOS
from semi_supervised_asr_tpu.models import lm as LM

V = 12


def tiny_lm(key=0, max_len=16, vocab=V):
    return LM.init_transformer_lm(
        jax.random.PRNGKey(key), vocab, d_model=16, layers=2, heads=4,
        d_ff=32, max_len=max_len,
    )


class TestTransformerLM:
    def test_forward_matches_stepped(self, rng):
        p = tiny_lm()
        toks = jnp.asarray(rng.integers(0, V, (3, 9)), jnp.int32)
        full = LM.lm_forward(p, toks)               # dispatches
        state, _ = LM.lm_step(p, None, None, init_batch=3)
        stepped = []
        for u in range(9):
            state, logits = LM.lm_step(p, state, toks[:, u])
            stepped.append(logits)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(jnp.stack(stepped, axis=1)),
            rtol=2e-5, atol=2e-5,
        )

    def test_causality(self, rng):
        p = tiny_lm()
        toks = jnp.asarray(rng.integers(0, V, (1, 8)), jnp.int32)
        out_a = LM.lm_forward(p, toks)
        toks_b = toks.at[0, 5].set((int(toks[0, 5]) + 3) % V)
        out_b = LM.lm_forward(p, toks_b)
        # positions before the edit are unchanged, at/after differ
        np.testing.assert_allclose(
            np.asarray(out_a[:, :5]), np.asarray(out_b[:, :5]),
            rtol=1e-6, atol=1e-6,
        )
        assert not np.allclose(out_a[:, 5], out_b[:, 5])

    def test_trains(self):
        import optax

        p = tiny_lm(1)
        toks = jnp.asarray([[4, 5, 6, EOS], [5, 6, 4, EOS]], jnp.int32)
        opt = optax.adam(3e-3)
        opt_state = opt.init(p)
        grad_fn = jax.jit(jax.value_and_grad(LM.lm_loss))
        losses = []
        for _ in range(60):
            loss, g = grad_fn(p, toks)
            upd, opt_state = opt.update(g, opt_state)
            p = optax.apply_updates(p, upd)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5

    def test_state_layout_for_beam_reorder(self):
        # every leaf: leading stack axis, lattice row on axis 1
        p = tiny_lm()
        state, _ = LM.lm_step(p, None, None, init_batch=6)
        assert state["kc"].shape == (2, 6, 16, 16)
        assert state["vc"].shape == (2, 6, 16, 16)
        assert state["tpos"].shape == (1, 6)


class TestBeamFusion:
    def _setup(self):
        from tests.test_lm import CFG, setup

        return CFG, setup

    def test_biased_transformer_lm_changes_hypotheses(self):
        from semi_supervised_asr_tpu.config import DecodeConfig
        from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
        from tests.test_lm import CFG, setup

        params, enc, enc_mask, keys = setup(3)
        lm_params = tiny_lm(9, vocab=CFG.vocab_size)
        lm_params["b_out"] = lm_params["b_out"].at[7].set(50.0)
        dcfg = DecodeConfig(beam_size=3, lm_weight=1.0)
        h0, _ = beam_decode_from_enc(
            params["speller"], CFG, dcfg, enc, enc_mask, keys, 8
        )
        h1, _ = beam_decode_from_enc(
            params["speller"], CFG, dcfg, enc, enc_mask, keys, 8,
            lm_params=lm_params, lm_step_fn=LM.lm_step,
        )
        a, b = np.asarray(h0), np.asarray(h1)
        assert not np.array_equal(a, b)
        # the hard LM bias must drag every hypothesis's FIRST token to 7
        # (the unfused decode starts rows with 2/4 for this seed)
        assert (b[:, 0] == 7).all(), b

    def test_zero_weight_is_noop(self):
        from semi_supervised_asr_tpu.config import DecodeConfig
        from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
        from tests.test_lm import CFG, setup

        params, enc, enc_mask, keys = setup()
        dcfg = DecodeConfig(beam_size=3, lm_weight=0.0)
        h0, s0 = beam_decode_from_enc(
            params["speller"], CFG, dcfg, enc, enc_mask, keys, 8
        )
        h1, s1 = beam_decode_from_enc(
            params["speller"], CFG, dcfg, enc, enc_mask, keys, 8,
            lm_params=tiny_lm(9, vocab=CFG.vocab_size),
            lm_step_fn=LM.lm_step,
        )
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), rtol=1e-5
        )


class TestTrainerRoundTrip:
    def test_train_and_load(self, tmp_path):
        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.lm_trainer import (
            load_lm, train_lm,
        )

        cfg = load_config("configs/synthetic_smoke.yaml", [
            "lm.arch=transformer", "lm.embed_dim=16", "lm.layers=1",
            "lm.heads=2", "lm.ff_dim=32", "lm.max_len=16",
            "lm.total_steps=10", "lm.log_every=5", "lm.batch_size=8",
            "data.num_synthetic_utts=16",
        ])
        out = train_lm(cfg, tmp_path / "lm")
        assert np.isfinite(out["lm_loss"])
        params = load_lm(tmp_path / "lm", cfg, 65)
        assert "blocks" in params and len(params["blocks"]) == 1
        # restored params drive the step interface
        state, _ = LM.lm_step(params, None, None, init_batch=2)
        state, logits = LM.lm_step(
            params, state, jnp.asarray([4, 5], jnp.int32)
        )
        assert logits.shape == (2, 65)

    def test_max_len_guard(self, tmp_path):
        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.lm_trainer import train_lm

        cfg = load_config("configs/synthetic_smoke.yaml", [
            "lm.arch=transformer", "lm.max_len=4",
            "data.num_synthetic_utts=16",
        ])
        with pytest.raises(AssertionError, match="max_len"):
            train_lm(cfg, tmp_path / "lm2")
