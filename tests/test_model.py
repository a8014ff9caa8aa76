"""Model-core tests: listener shapes/masking, attention correctness,
teacher-forced forward, weight sharing (SURVEY.md §5.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.models import attention as A
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.models import speller as S
from semi_supervised_asr_tpu.models.listener import listener_apply

CFG = ModelConfig(
    n_mels=8, vocab_size=12, enc_hidden=16, enc_layers=2, enc_base_layers=1,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=16, dec_layers=1, embed_dim=8, compute_dtype="float32",
)


def make_batch(key, b=2, t=16, u=5):
    kf, kt = jax.random.split(jax.random.PRNGKey(key))
    feats = jax.random.normal(kf, (b, t, CFG.n_mels), jnp.float32)
    tokens = jax.random.randint(kt, (b, u), 4, CFG.vocab_size)
    return feats, tokens


class TestListener:
    def test_shapes_and_time_reduction(self):
        params = M.init_model(jax.random.PRNGKey(0), CFG)
        feats, _ = make_batch(0, b=3, t=16)
        lens = jnp.array([16, 10, 4])
        enc, enc_lens = listener_apply(params["listener"], feats, lens, CFG)
        assert enc.shape == (3, 16 // CFG.time_reduction, CFG.enc_out_dim)
        np.testing.assert_array_equal(np.asarray(enc_lens), [4, 3, 1])

    def test_pad_invariance(self):
        # the encoded prefix of a short utterance must not depend on what
        # sits in the padding region (SURVEY.md §8.3 risk 1)
        params = M.init_model(jax.random.PRNGKey(1), CFG)
        feats, _ = make_batch(1, b=1, t=16)
        lens = jnp.array([8])
        enc1, _ = listener_apply(params["listener"], feats, lens, CFG)
        garbage = feats.at[:, 8:].set(99.0)
        enc2, _ = listener_apply(params["listener"], garbage, lens, CFG)
        np.testing.assert_allclose(
            np.asarray(enc1[:, :2]), np.asarray(enc2[:, :2]), rtol=1e-5
        )


class TestAttention:
    def test_pads_get_exact_zero(self):
        key = jax.random.PRNGKey(2)
        p = A.init_attention(key, CFG)
        b, t = 3, 7
        q = jax.random.normal(key, (b, CFG.dec_hidden))
        keys = jax.random.normal(key, (b, t, CFG.attn_dim))
        vals = jax.random.normal(key, (b, t, CFG.enc_out_dim))
        mask = jnp.arange(t)[None, :] < jnp.array([7, 4, 1])[:, None]
        alpha0 = A.initial_alpha(mask)
        ctx, alpha = A.attend(p, q, alpha0, keys, vals, mask)
        alpha = np.asarray(alpha)
        assert np.all(alpha[1, 4:] == 0.0)
        assert np.all(alpha[2, 1:] == 0.0)
        np.testing.assert_allclose(alpha.sum(-1), 1.0, rtol=1e-6)
        assert ctx.shape == (b, CFG.enc_out_dim)

    def test_initial_alpha_uniform(self):
        mask = jnp.array([[True] * 4 + [False] * 4])
        a = np.asarray(A.initial_alpha(mask))
        np.testing.assert_allclose(a[0, :4], 0.25)
        assert np.all(a[0, 4:] == 0.0)

    def test_location_conv_shape(self):
        p = A.init_attention(jax.random.PRNGKey(3), CFG)
        f = A.location_features(p, jnp.ones((2, 9)))
        assert f.shape == (2, 9, CFG.attn_conv_channels)


class TestForward:
    def test_teacher_forced_shapes(self):
        params = M.init_model(jax.random.PRNGKey(4), CFG)
        feats, tokens = make_batch(4)
        lens = jnp.array([16, 12])
        logits, alphas = M.forward_teacher(
            params, CFG, feats, lens, tokens, tf_rate=1.0,
            rng=jax.random.PRNGKey(0),
        )
        assert logits.shape == (2, 5, CFG.vocab_size)
        assert alphas.shape == (2, 5, 16 // CFG.time_reduction)

    def test_scheduled_sampling_changes_outputs(self):
        params = M.init_model(jax.random.PRNGKey(5), CFG)
        feats, tokens = make_batch(5, u=8)
        lens = jnp.array([16, 16])
        l_tf, _ = M.forward_teacher(
            params, CFG, feats, lens, tokens, 1.0, jax.random.PRNGKey(1)
        )
        l_ss, _ = M.forward_teacher(
            params, CFG, feats, lens, tokens, 0.0, jax.random.PRNGKey(1)
        )
        # step 0 identical (always ground-truth <sos>); later steps differ
        np.testing.assert_allclose(
            np.asarray(l_tf[:, 0]), np.asarray(l_ss[:, 0]), rtol=1e-5
        )
        assert not np.allclose(np.asarray(l_tf[:, 2:]), np.asarray(l_ss[:, 2:]))

    def test_forward_jits(self):
        params = M.init_model(jax.random.PRNGKey(6), CFG)
        feats, tokens = make_batch(6)
        lens = jnp.array([16, 16])
        f = jax.jit(
            lambda p, x, l, t: M.forward_teacher(
                p, CFG, x, l, t, 1.0, jax.random.PRNGKey(0)
            )[0]
        )
        out = f(params, feats, lens, tokens)
        assert np.all(np.isfinite(np.asarray(out)))


class TestWeightSharing:
    def test_text_ae_uses_same_arrays(self):
        """Text-AE gradients must land on the SAME speller params."""
        params = M.init_model(jax.random.PRNGKey(7), CFG)
        tokens = jnp.array([[4, 5, 6, 2, 0]])

        def ae_loss(p):
            logits = S.text_autoencoder_logits(p["speller"], CFG, tokens)
            return jnp.sum(logits**2)

        g = jax.grad(ae_loss)(params)
        # decoder params receive gradient...
        assert np.any(np.asarray(g["speller"]["embedding"]) != 0)
        assert np.any(np.asarray(g["speller"]["w_out"]) != 0)
        # ...while the listener gets none (no audio path)
        assert all(
            np.all(np.asarray(x) == 0)
            for x in jax.tree.leaves(g["listener"])
        )


class TestAttentionVariants:
    def _setup(self, attn_type, seed=0, b=2, t=6):
        import dataclasses

        from semi_supervised_asr_tpu.models import attention as A

        cfg = dataclasses.replace(CFG, attn_type=attn_type)
        params = A.init_attention(jax.random.PRNGKey(seed), cfg)
        rng = jax.random.PRNGKey(seed + 1)
        enc = jax.random.normal(rng, (b, t, cfg.enc_out_dim))
        mask = jnp.asarray([[True] * t, [True] * (t - 2) + [False] * 2])
        keys = A.precompute_keys(params, enc)
        query = jax.random.normal(jax.random.PRNGKey(seed + 2),
                                  (b, cfg.dec_hidden))
        alpha0 = A.initial_alpha(mask)
        return cfg, A, params, query, alpha0, keys, enc, mask

    @pytest.mark.parametrize("attn_type", ["location", "additive", "dot"])
    def test_pads_get_exact_zero(self, attn_type):
        cfg, A, params, query, alpha0, keys, enc, mask = self._setup(
            attn_type)
        ctx, alpha = A.attend(params, query, alpha0, keys, enc, mask)
        assert ctx.shape == (2, cfg.enc_out_dim)
        a = np.asarray(alpha)
        np.testing.assert_array_equal(a[1, 4:], 0.0)
        np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-6)

    @pytest.mark.parametrize("attn_type", ["additive", "dot"])
    def test_content_only_ignores_alignment(self, attn_type):
        """Non-location variants must not depend on the previous alpha."""
        cfg, A, params, query, alpha0, keys, enc, mask = self._setup(
            attn_type)
        other = jnp.roll(alpha0, 1, axis=-1)
        _, a1 = A.attend(params, query, alpha0, keys, enc, mask)
        _, a2 = A.attend(params, query, other, keys, enc, mask)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))

    def test_location_uses_alignment(self):
        cfg, A, params, query, alpha0, keys, enc, mask = self._setup(
            "location")
        other = jnp.concatenate(
            [alpha0[:, 1:], alpha0[:, :1]], axis=-1) * mask
        _, a1 = A.attend(params, query, alpha0, keys, enc, mask)
        _, a2 = A.attend(params, query, other, keys, enc, mask)
        assert not np.array_equal(np.asarray(a1), np.asarray(a2))

    @pytest.mark.parametrize("attn_type", ["additive", "dot"])
    def test_end_to_end_forward_and_beam(self, attn_type):
        """Full model + beam search work with every attention variant."""
        import dataclasses

        from semi_supervised_asr_tpu.config import DecodeConfig
        from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc

        cfg = dataclasses.replace(CFG, attn_type=attn_type)
        params = M.init_model(jax.random.PRNGKey(7), cfg)
        feats = jax.random.normal(jax.random.PRNGKey(8), (2, 8, cfg.n_mels))
        lens = jnp.asarray([8, 6])
        enc, enc_mask, keys = M.encode(params, feats, lens, cfg)
        tokens_in = jnp.asarray([[1, 4, 5], [1, 5, 6]], jnp.int32)
        logits, alphas = M.forward_teacher(
            params, cfg, feats, lens, tokens_in, tf_rate=1.0,
            rng=jax.random.PRNGKey(0))
        assert logits.shape == (2, 3, cfg.vocab_size)
        assert np.isfinite(np.asarray(logits)).all()
        hyps, scores = beam_decode_from_enc(
            params["speller"], cfg, DecodeConfig(beam_size=2),
            enc, enc_mask, keys, 6)
        assert hyps.shape == (2, 6)
