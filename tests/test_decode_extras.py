"""Coverage penalty + tied embedding tests."""

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import DecodeConfig, ModelConfig
from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
from semi_supervised_asr_tpu.models import seq2seq as M

BASE = dict(
    n_mels=8, vocab_size=10, enc_hidden=12, enc_layers=1, enc_base_layers=1,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=12, dec_layers=1, embed_dim=8, compute_dtype="float32",
)


def setup(cfg, seed=0, b=2, t=8):
    params = M.init_model(jax.random.PRNGKey(seed), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, cfg.n_mels))
    lens = jnp.asarray([t, t - 2][:b])
    enc, enc_mask, keys = M.encode(params, feats, lens, cfg)
    return params, enc, enc_mask, keys


class TestCoverage:
    def test_zero_weight_unchanged(self):
        cfg = ModelConfig(**BASE)
        params, enc, enc_mask, keys = setup(cfg)
        h0, s0 = beam_decode_from_enc(
            params["speller"], cfg, DecodeConfig(beam_size=3),
            enc, enc_mask, keys, 8,
        )
        h1, s1 = beam_decode_from_enc(
            params["speller"], cfg,
            DecodeConfig(beam_size=3, coverage_weight=0.0),
            enc, enc_mask, keys, 8,
        )
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))

    def test_coverage_changes_scores(self):
        cfg = ModelConfig(**BASE)
        params, enc, enc_mask, keys = setup(cfg, 3)
        _, s0 = beam_decode_from_enc(
            params["speller"], cfg, DecodeConfig(beam_size=3),
            enc, enc_mask, keys, 8,
        )
        _, s1 = beam_decode_from_enc(
            params["speller"], cfg,
            DecodeConfig(beam_size=3, coverage_weight=0.5),
            enc, enc_mask, keys, 8,
        )
        # coverage penalty is <= 0, so scores move down (or hyps change)
        assert np.all(np.asarray(s1) <= np.asarray(s0) + 1e-6)
        assert not np.allclose(np.asarray(s0), np.asarray(s1))


class TestTiedEmbedding:
    def test_tied_params_and_forward(self):
        cfg = ModelConfig(**{**BASE, "tie_embedding": True})
        params = M.init_model(jax.random.PRNGKey(0), cfg)
        sp = params["speller"]
        assert "w_tie" in sp and "w_out" not in sp
        feats = jax.random.normal(jax.random.PRNGKey(1), (2, 8, cfg.n_mels))
        tokens = jnp.asarray([[4, 5, 2, 0], [6, 7, 8, 2]], jnp.int32)
        logits, _ = M.forward_teacher(
            params, cfg, feats, jnp.asarray([8, 8]), tokens,
            1.0, jax.random.PRNGKey(2),
        )
        assert logits.shape == (2, 4, cfg.vocab_size)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_tied_gradients_flow_to_embedding(self):
        cfg = ModelConfig(**{**BASE, "tie_embedding": True})
        params = M.init_model(jax.random.PRNGKey(0), cfg)
        feats = jax.random.normal(jax.random.PRNGKey(1), (1, 8, cfg.n_mels))
        tokens = jnp.asarray([[4, 5, 2, 0]], jnp.int32)

        def loss(p):
            lg, _ = M.forward_teacher(
                p, cfg, feats, jnp.asarray([8]), tokens,
                1.0, jax.random.PRNGKey(2),
            )
            return jnp.sum(lg**2)

        g = jax.grad(loss)(params)
        assert np.any(np.asarray(g["speller"]["embedding"]) != 0)
        assert np.any(np.asarray(g["speller"]["w_tie"]) != 0)

    def test_tied_beam_decodes(self):
        cfg = ModelConfig(**{**BASE, "tie_embedding": True})
        params, enc, enc_mask, keys = setup(cfg, 5)
        hyps, scores = beam_decode_from_enc(
            params["speller"], cfg, DecodeConfig(beam_size=3),
            enc, enc_mask, keys, 8,
        )
        assert hyps.shape == (2, 8)
        assert np.all(np.isfinite(np.asarray(scores)))
