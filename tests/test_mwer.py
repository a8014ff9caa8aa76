"""MWER sequence training: jit edit distance + expected-risk objective.

* ops/edit_distance.py must match python-Levenshtein on random variable-
  length sequences (including the [B, K]-batched n-best layout);
* objectives/losses.expected_risk must match the hand formula and vanish
  when all hypotheses carry equal risk;
* the full mwer_loss and the fused train step with lambda_mwer > 0 must
  run, be finite, and actually push gradients into the model.
"""

import dataclasses

import jax
import jax.numpy as jnp
import Levenshtein
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.objectives import losses as LO
from semi_supervised_asr_tpu.ops.edit_distance import batched_edit_distance
from semi_supervised_asr_tpu.training import train_step as TS


class TestJitEditDistance:
    def _oracle(self, h, r):
        return Levenshtein.distance(
            "".join(chr(t + 100) for t in h), "".join(chr(t + 100) for t in r)
        )

    def test_matches_levenshtein_random(self, rng):
        b, u1, u2 = 24, 17, 13
        hyp = rng.integers(0, 6, (b, u1)).astype(np.int32)
        ref = rng.integers(0, 6, (b, u2)).astype(np.int32)
        hlens = rng.integers(0, u1 + 1, (b,)).astype(np.int32)
        rlens = rng.integers(0, u2 + 1, (b,)).astype(np.int32)
        got = np.asarray(
            jax.jit(batched_edit_distance)(hyp, hlens, ref, rlens)
        )
        want = [
            self._oracle(hyp[i, : hlens[i]], ref[i, : rlens[i]])
            for i in range(b)
        ]
        np.testing.assert_array_equal(got, want)

    def test_nbest_layout(self, rng):
        b, k, u = 4, 3, 9
        hyp = rng.integers(0, 5, (b, k, u)).astype(np.int32)
        ref = rng.integers(0, 5, (b, u)).astype(np.int32)
        hlens = rng.integers(1, u + 1, (b, k)).astype(np.int32)
        rlens = rng.integers(1, u + 1, (b,)).astype(np.int32)
        got = np.asarray(batched_edit_distance(
            hyp, hlens,
            np.broadcast_to(ref[:, None, :], (b, k, u)),
            np.broadcast_to(rlens[:, None], (b, k)),
        ))
        for i in range(b):
            for j in range(k):
                assert got[i, j] == self._oracle(
                    hyp[i, j, : hlens[i, j]], ref[i, : rlens[i]]
                )

    def test_identical_and_empty(self):
        seq = np.array([[3, 4, 5, 0]], np.int32)
        assert int(batched_edit_distance(
            seq, np.array([3]), seq, np.array([3])
        )[0]) == 0
        assert int(batched_edit_distance(
            seq, np.array([0]), seq, np.array([3])
        )[0]) == 3  # empty hyp = all insertions


class TestExpectedRisk:
    def test_hand_formula(self):
        logp = jnp.log(jnp.array([[0.5, 0.25, 0.25]]))
        risks = jnp.array([[0.0, 2.0, 4.0]])
        w = jnp.ones((1,))
        loss, mean_risk = LO.expected_risk(logp, risks, w)
        # p·(r - r̄) with r̄ = 2: 0.5*(-2) + 0.25*0 + 0.25*2 = -0.5
        np.testing.assert_allclose(float(loss), -0.5, rtol=1e-6)
        np.testing.assert_allclose(float(mean_risk), 1.5, rtol=1e-6)

    def test_equal_risks_zero(self):
        logp = jnp.array([[0.3, -1.2, 0.9]])
        risks = jnp.full((1, 3), 7.0)
        loss, _ = LO.expected_risk(logp, risks, jnp.ones((1,)))
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_gradient_prefers_low_risk(self):
        # pushing down expected risk must raise the low-risk hyp's logp
        risks = jnp.array([[1.0, 5.0]])
        w = jnp.ones((1,))
        g = jax.grad(
            lambda lp: LO.expected_risk(lp, risks, w)[0]
        )(jnp.zeros((1, 2)))
        assert float(g[0, 0]) < 0 < float(g[0, 1])

    def test_padding_rows_ignored(self):
        logp = jnp.zeros((2, 2))
        risks = jnp.array([[0.0, 4.0], [100.0, 100.0]])
        loss, mean_risk = LO.expected_risk(
            logp, risks, jnp.array([1.0, 0.0])
        )
        np.testing.assert_allclose(float(mean_risk), 2.0, rtol=1e-6)


CFG = Config(
    frontend=FrontendConfig(spec_augment=False, cmvn="global"),
    model=ModelConfig(
        n_mels=80, vocab_size=16, enc_hidden=8, enc_layers=2,
        enc_base_layers=1, attn_dim=8, attn_conv_channels=4,
        attn_conv_width=5, dec_hidden=8, dec_layers=1, embed_dim=8,
        compute_dtype="float32",
    ),
    objective=ObjectiveConfig(
        tf_rate_start=1.0, tf_rate_end=1.0, lambda_mwer=0.5, mwer_beam=3,
    ),
    train=TrainConfig(learning_rate=1e-3),
)


def make_batch(seed=0, b=4, s=3040, u=6):
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal((b, s)).astype(np.float32) * 0.1
    audio_lens = np.full((b,), s, np.int32)
    tokens = np.zeros((b, u), np.int32)
    for i in range(b):
        tokens[i, : u - 1] = rng.integers(4, 16, u - 1)
        tokens[i, u - 1] = 2
    real = np.ones((b,), bool)
    cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
    return audio, audio_lens, tokens, real, cmvn


class TestMWERLoss:
    def test_loss_and_grads(self):
        audio, alens, tokens, real, cmvn = make_batch()
        state = TS.init_train_state(CFG, jax.random.PRNGKey(0))
        feats, flens = TS.featurize(CFG, audio, alens, cmvn, None, False)

        def f(params):
            return LO.mwer_loss(
                params, CFG.model, CFG.objective, feats, flens,
                jnp.asarray(tokens),
            )[0]

        loss, grads = jax.jit(jax.value_and_grad(f))(state.params)
        assert np.isfinite(float(loss))
        g_out = np.asarray(grads["speller"]["w_out"])
        assert np.any(g_out != 0.0), "MWER must reach the output layer"
        # n-best selection is discrete: no gradient enters via the risks
        assert np.all(np.isfinite(
            np.concatenate([np.ravel(g) for g in jax.tree.leaves(grads)])
        ))

    def test_train_step_with_mwer(self):
        audio, alens, tokens, real, cmvn = make_batch()
        state = TS.init_train_state(CFG, jax.random.PRNGKey(0))
        step = TS.make_train_step(CFG)
        state, m = step(state, audio, alens, tokens, real, *cmvn)
        assert np.isfinite(float(m["loss"]))
        assert "mwer" in m and "mwer_risk" in m
        assert float(m["mwer_risk"]) >= 0.0

    def test_warmup_gate(self):
        cfg = CFG.replace(
            objective=dataclasses.replace(
                CFG.objective, mwer_warmup_steps=100
            )
        )
        audio, alens, tokens, real, cmvn = make_batch()
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg)
        state0 = TS.init_train_state(
            cfg.replace(objective=dataclasses.replace(
                cfg.objective, lambda_mwer=0.0)),
            jax.random.PRNGKey(0),
        )
        step0 = TS.make_train_step(cfg.replace(
            objective=dataclasses.replace(cfg.objective, lambda_mwer=0.0)))
        state, m = step(state, audio, alens, tokens, real, *cmvn)
        state0, m0 = step0(state0, audio, alens, tokens, real, *cmvn)
        # gated off before warmup: same total loss as the CE-only step
        np.testing.assert_allclose(
            float(m["loss"]), float(m0["loss"]), rtol=1e-6
        )
