"""Objective tests: masked CE vs hand computation, label smoothing,
text-AE weight sharing, pseudo-label stop-gradient (SURVEY.md §5.2)."""

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import ModelConfig, ObjectiveConfig
from semi_supervised_asr_tpu.data.vocab import EOS, PAD, SOS
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.objectives import losses as LO

import pytest

pytestmark = pytest.mark.quick  # core merge-gate subset (pytest.ini)

CFG = ModelConfig(
    n_mels=8, vocab_size=12, enc_hidden=16, enc_layers=2, enc_base_layers=1,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=16, dec_layers=1, embed_dim=8, compute_dtype="float32",
)
OBJ = ObjectiveConfig()


class TestShift:
    def test_shift_targets(self):
        toks = jnp.array([[5, 6, EOS, PAD]])
        inp, tgt = LO.shift_targets(toks)
        np.testing.assert_array_equal(np.asarray(inp), [[SOS, 5, 6, EOS]])
        np.testing.assert_array_equal(np.asarray(tgt), [[5, 6, EOS, PAD]])

    def test_mask_includes_eos(self):
        tgt = jnp.array([[5, 6, EOS, PAD]])
        np.testing.assert_array_equal(
            np.asarray(LO.token_mask(tgt)), [[1.0, 1.0, 1.0, 0.0]]
        )


class TestMaskedCE:
    def test_matches_hand_computation(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((2, 3, 7)), jnp.float32)
        targets = jnp.array([[4, EOS, PAD], [5, 6, EOS]])
        loss, _ = LO.masked_ce(logits, targets)
        lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        hand = -(lp[0, 0, 4] + lp[0, 1, EOS] + lp[1, 0, 5] + lp[1, 1, 6] + lp[1, 2, EOS]) / 5
        np.testing.assert_allclose(float(loss), hand, rtol=1e-6)

    def test_label_smoothing_direction(self):
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.standard_normal((1, 2, 7)) * 5, jnp.float32)
        targets = jnp.argmax(logits, axis=-1)  # confident & correct
        plain, _ = LO.masked_ce(logits, targets, 0.0)
        smooth, _ = LO.masked_ce(logits, targets, 0.1)
        assert float(smooth) > float(plain)  # smoothing penalizes confidence

    def test_pad_positions_ignored(self):
        logits = jnp.zeros((1, 3, 7))
        t1 = jnp.array([[4, EOS, PAD]])
        loss1, _ = LO.masked_ce(logits, t1)
        # changing logits at the PAD position must not change the loss
        logits2 = logits.at[0, 2].set(100.0)
        loss2, _ = LO.masked_ce(logits2, t1)
        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)


class TestSemiSupervised:
    def _setup(self):
        params = M.init_model(jax.random.PRNGKey(0), CFG)
        feats = jax.random.normal(jax.random.PRNGKey(1), (2, 16, CFG.n_mels))
        lens = jnp.array([16, 12])
        return params, feats, lens

    def test_pseudo_label_teacher_gets_no_grad(self):
        params, feats, lens = self._setup()

        def loss(p, teacher):
            return LO.pseudo_label_loss(
                p, teacher, CFG, OBJ, feats, feats, lens,
                jax.random.PRNGKey(2), max_len=6,
            )

        # grad wrt teacher params must be exactly zero
        g_teacher = jax.grad(loss, argnums=1)(params, params)
        assert all(
            np.all(np.asarray(x) == 0) for x in jax.tree.leaves(g_teacher)
        )
        # grad wrt student must be nonzero somewhere
        g_student = jax.grad(loss, argnums=0)(params, params)
        assert any(
            np.any(np.asarray(x) != 0) for x in jax.tree.leaves(g_student)
        )

    def test_text_ae_loss_finite_and_grads_decoder_only(self):
        params, _, _ = self._setup()
        text = jnp.array([[4, 5, 6, EOS, PAD], [7, 8, EOS, PAD, PAD]])

        def loss(p):
            return LO.text_ae_loss(p, CFG, OBJ, text)

        val = loss(params)
        assert np.isfinite(float(val))
        g = jax.grad(loss)(params)
        assert all(
            np.all(np.asarray(x) == 0) for x in jax.tree.leaves(g["listener"])
        )
        assert np.any(np.asarray(g["speller"]["embedding"]) != 0)

    def test_supervised_loss_runs(self):
        params, feats, lens = self._setup()
        tokens = jnp.array([[4, 5, EOS, PAD], [6, 7, 8, EOS]])
        loss, aux = LO.supervised_loss(
            params, CFG, OBJ, feats, lens, tokens, 1.0, jax.random.PRNGKey(3)
        )
        assert np.isfinite(float(loss))
        assert 0.0 <= float(aux["acc"]) <= 1.0
