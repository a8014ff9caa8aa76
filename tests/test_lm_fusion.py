"""Deep / cold LM fusion (models/speller.py, SURVEY.md §3 #17 extension).

The fused LM is frozen (stop-grad); the gate/DNN is trainable.  Beyond
shape/gradient checks, the jit beam must still match the Python oracle
with fusion enabled (the LM state rides the decoder state dict through
the gather-reorder).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import DecodeConfig, ModelConfig
from semi_supervised_asr_tpu.data.vocab import EOS, PAD
from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
from semi_supervised_asr_tpu.decode.greedy import greedy_decode_from_enc
from semi_supervised_asr_tpu.decode.python_beam import beam_decode_python
from semi_supervised_asr_tpu.models import lm as LM, seq2seq as M, speller as S
from semi_supervised_asr_tpu.objectives.losses import masked_ce, shift_targets

BASE = ModelConfig(
    n_mels=8, vocab_size=10, enc_hidden=12, enc_layers=1, enc_base_layers=1,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=12, dec_layers=1, embed_dim=8, compute_dtype="float32",
    lm_fusion_embed=8, lm_fusion_hidden=16, lm_fusion_layers=1,
    lm_fusion_dim=6,
)
MAX_LEN = 8


def cfg_for(kind):
    return dataclasses.replace(BASE, lm_fusion=kind)


def setup(kind, seed=0, b=3, t=8):
    cfg = cfg_for(kind)
    params = M.init_model(jax.random.PRNGKey(seed), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, cfg.n_mels))
    lens = jnp.array([t, t - 2, t - 4][:b])
    enc, enc_mask, keys = M.encode(params, feats, lens, cfg)
    return cfg, params, enc, enc_mask, keys, feats, lens


def strip(tokens):
    out = []
    for tok in np.asarray(tokens).tolist():
        if tok == PAD:
            continue
        out.append(tok)
        if tok == EOS:
            break
    return out


class TestShapesAndState:
    @pytest.mark.parametrize("kind", ["deep", "cold"])
    def test_forward_runs_and_state_has_lm(self, kind):
        cfg, params, enc, enc_mask, keys, feats, lens = setup(kind)
        assert "fusion" in params["speller"]
        assert "fusion_lm" in params["speller"]
        state = S.init_state(3, enc.shape[1], cfg, enc_mask)
        assert state["lm_h"].shape == (1, 3, 16)
        tok = jnp.array([4, 5, 6], jnp.int32)
        new_state, logits, alpha = S.speller_step(
            params["speller"], cfg, state, tok, keys, enc, enc_mask
        )
        assert logits.shape == (3, cfg.vocab_size)
        assert new_state["lm_h"].shape == state["lm_h"].shape
        assert not np.allclose(
            np.asarray(new_state["lm_h"]), np.asarray(state["lm_h"])
        )

    @pytest.mark.parametrize("kind", ["deep", "cold"])
    def test_fusion_changes_logits(self, kind):
        """Same seed, fusion on vs off -> different output distribution."""
        cfg_on, params_on, enc, enc_mask, keys, feats, lens = setup(kind)
        cfg_off = cfg_for("none")
        params_off = M.init_model(jax.random.PRNGKey(0), cfg_off)
        tokens_in = jnp.array([[1, 4, 5]], jnp.int32)
        lo, _ = M.forward_teacher(
            params_on, cfg_on, feats[:1], lens[:1], tokens_in,
            tf_rate=1.0, rng=jax.random.PRNGKey(0))
        lf, _ = M.forward_teacher(
            params_off, cfg_off, feats[:1], lens[:1], tokens_in,
            tf_rate=1.0, rng=jax.random.PRNGKey(0))
        assert lo.shape == lf.shape
        assert not np.allclose(np.asarray(lo), np.asarray(lf))


class TestFrozenLM:
    @pytest.mark.parametrize("kind", ["deep", "cold"])
    def test_lm_gradient_exactly_zero(self, kind):
        cfg, params, enc, enc_mask, keys, feats, lens = setup(kind)
        tokens = jnp.array([[4, 5, 6, 2], [5, 6, 7, 2], [6, 7, 8, 2]],
                           jnp.int32)

        def loss_fn(p):
            tokens_in, targets = shift_targets(tokens)
            logits, _ = M.forward_teacher(
                p, cfg, feats, lens, tokens_in,
                tf_rate=1.0, rng=jax.random.PRNGKey(0))
            return masked_ce(logits, targets)[0]

        grads = jax.grad(loss_fn)(params)
        for leaf in jax.tree.leaves(grads["speller"]["fusion_lm"]):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
        fusion_grads = jax.tree.leaves(grads["speller"]["fusion"])
        assert any(np.abs(np.asarray(g)).max() > 0 for g in fusion_grads)

    def test_attach_fusion_lm(self):
        cfg, params, *_ = setup("cold")
        trained = LM.init_lm(jax.random.PRNGKey(99), cfg.vocab_size,
                             cfg.lm_fusion_embed, cfg.lm_fusion_hidden,
                             cfg.lm_fusion_layers)
        sp = S.attach_fusion_lm(params["speller"], trained)
        np.testing.assert_array_equal(
            np.asarray(sp["fusion_lm"]["embedding"]),
            np.asarray(trained["embedding"]))
        bad = LM.init_lm(jax.random.PRNGKey(99), cfg.vocab_size, 4, 4, 1)
        with pytest.raises(AssertionError, match="mismatch"):
            S.attach_fusion_lm(params["speller"], bad)


class TestDecodeEquivalence:
    @pytest.mark.parametrize("kind", ["deep", "cold"])
    def test_beam_matches_python_oracle(self, kind):
        cfg, params, enc, enc_mask, keys, feats, lens = setup(kind)
        dcfg = DecodeConfig(beam_size=3, length_penalty=1.0)
        hyps, scores = beam_decode_from_enc(
            params["speller"], cfg, dcfg, enc, enc_mask, keys, MAX_LEN
        )
        for b in range(enc.shape[0]):
            ref_toks, ref_score = beam_decode_python(
                params["speller"], cfg, dcfg,
                enc[b: b + 1], enc_mask[b: b + 1], keys[b: b + 1], MAX_LEN,
            )
            assert strip(hyps[b]) == ref_toks, b
            np.testing.assert_allclose(float(scores[b]), ref_score, rtol=1e-4)

    def test_greedy_equals_beam_k1_cold(self):
        cfg, params, enc, enc_mask, keys, feats, lens = setup("cold", seed=3)
        dcfg = DecodeConfig(beam_size=1, length_penalty=1.0)
        bh, _ = beam_decode_from_enc(
            params["speller"], cfg, dcfg, enc, enc_mask, keys, MAX_LEN
        )
        gh, _ = greedy_decode_from_enc(
            params["speller"], cfg, enc, enc_mask, keys, MAX_LEN
        )
        for b in range(enc.shape[0]):
            assert strip(bh[b]) == strip(gh[b])


class TestTrainingWithFusion:
    def test_train_step_learns_cold(self):
        from semi_supervised_asr_tpu.config import (
            Config, FrontendConfig, ObjectiveConfig, TrainConfig,
        )
        from semi_supervised_asr_tpu.training import train_step as TS

        cfg = Config(
            frontend=FrontendConfig(spec_augment=False, cmvn="global"),
            model=dataclasses.replace(
                BASE, n_mels=80, lm_fusion="cold", vocab_size=16),
            objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
            train=TrainConfig(learning_rate=3e-3, batch_size=2),
        )
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg)
        rng = np.random.default_rng(0)
        audio = rng.standard_normal((2, 3040)).astype(np.float32) * 0.1
        alens = np.full((2,), 3040, np.int32)
        tokens = np.asarray([[4, 5, 6, 7, 8, 2], [5, 6, 7, 8, 9, 2]],
                            np.int32)
        real = np.ones((2,), bool)
        cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
        lm0 = np.asarray(
            state.params["speller"]["fusion_lm"]["w_out"]).copy()
        losses = []
        for _ in range(10):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.9, losses
        # frozen LM params unchanged by training
        np.testing.assert_array_equal(
            np.asarray(state.params["speller"]["fusion_lm"]["w_out"]), lm0)
