"""Decoder/encoder dropout behavior tests."""

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.models import seq2seq as M

BASE = dict(
    n_mels=8, vocab_size=10, enc_hidden=12, enc_layers=1, enc_base_layers=1,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=12, dec_layers=1, embed_dim=8, compute_dtype="float32",
)


def run(cfg, train, seed=0):
    params = M.init_model(jax.random.PRNGKey(0), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.n_mels))
    tokens = jnp.asarray([[4, 5, 2, 0], [6, 7, 8, 2]], jnp.int32)
    logits, _ = M.forward_teacher(
        params, cfg, feats, jnp.asarray([8, 8]), tokens,
        1.0, jax.random.PRNGKey(seed), train=train,
    )
    return np.asarray(logits)


class TestDecoderDropout:
    def test_inactive_at_eval(self):
        cfg = ModelConfig(**{**BASE, "dec_dropout": 0.5})
        a = run(cfg, train=False, seed=2)
        b = run(cfg, train=False, seed=3)  # different rng, eval mode
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_active_and_stochastic_at_train(self):
        cfg = ModelConfig(**{**BASE, "dec_dropout": 0.5})
        a = run(cfg, train=True, seed=2)
        b = run(cfg, train=True, seed=3)
        assert not np.allclose(a, b)
        # and differs from eval mode
        c = run(cfg, train=False, seed=2)
        assert not np.allclose(a, c)

    def test_zero_rate_is_noop(self):
        cfg = ModelConfig(**{**BASE, "dec_dropout": 0.0})
        a = run(cfg, train=True, seed=2)
        b = run(cfg, train=False, seed=2)
        np.testing.assert_allclose(a, b, rtol=1e-6)


class TestEncoderDropout:
    def test_enc_dropout_stochastic(self):
        cfg = ModelConfig(**{**BASE, "enc_dropout": 0.5})
        params = M.init_model(jax.random.PRNGKey(0), cfg)
        feats = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.n_mels))
        lens = jnp.asarray([8])

        def enc(seed, train):
            e, _, _ = M.encode(
                params, feats, lens, cfg, train=train,
                dropout_rng=jax.random.PRNGKey(seed),
            )
            return np.asarray(e)

        assert not np.allclose(enc(0, True), enc(1, True))
        np.testing.assert_allclose(enc(0, False), enc(1, False), rtol=1e-6)
