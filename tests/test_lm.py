"""LM + shallow fusion tests (SURVEY.md §3 #17)."""

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import DecodeConfig, ModelConfig
from semi_supervised_asr_tpu.data.vocab import EOS, PAD
from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
from semi_supervised_asr_tpu.models import lm as LM
from semi_supervised_asr_tpu.models import seq2seq as M

CFG = ModelConfig(
    n_mels=8, vocab_size=10, enc_hidden=12, enc_layers=1, enc_base_layers=1,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=12, dec_layers=1, embed_dim=8, compute_dtype="float32",
)


def setup(seed=0, b=2, t=8):
    params = M.init_model(jax.random.PRNGKey(seed), CFG)
    feats = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, CFG.n_mels))
    lens = jnp.asarray([t] * b)
    enc, enc_mask, keys = M.encode(params, feats, lens, CFG)
    return params, enc, enc_mask, keys


class TestLMCore:
    def test_step_and_forward_consistent(self):
        p = LM.init_lm(jax.random.PRNGKey(0), 10, 8, 12, layers=2)
        toks = jnp.asarray([[1, 4, 5], [1, 6, 7]], jnp.int32)
        full = LM.lm_forward(p, toks)
        state, _ = LM.lm_step(p, None, None, init_batch=2)
        outs = []
        for u in range(3):
            state, logits = LM.lm_step(p, state, toks[:, u])
            outs.append(logits)
        stepped = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(
            np.asarray(full), np.asarray(stepped), rtol=1e-5, atol=1e-6
        )

    def test_lm_trains(self):
        import optax

        p = LM.init_lm(jax.random.PRNGKey(1), 10, 8, 16)
        toks = jnp.asarray([[4, 5, 6, EOS], [5, 6, 4, EOS]], jnp.int32)
        opt = optax.adam(1e-2)
        opt_state = opt.init(p)
        losses = []
        grad_fn = jax.jit(jax.value_and_grad(LM.lm_loss))
        for _ in range(30):
            loss, g = grad_fn(p, toks)
            upd, opt_state = opt.update(g, opt_state)
            p = optax.apply_updates(p, upd)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5


class TestShallowFusion:
    def test_zero_weight_is_noop(self):
        params, enc, enc_mask, keys = setup()
        lm_params = LM.init_lm(jax.random.PRNGKey(9), CFG.vocab_size, 8, 12)
        base = DecodeConfig(beam_size=3, lm_weight=0.0)
        h0, s0 = beam_decode_from_enc(
            params["speller"], CFG, base, enc, enc_mask, keys, 8
        )
        h1, s1 = beam_decode_from_enc(
            params["speller"], CFG, base, enc, enc_mask, keys, 8,
            lm_params=lm_params, lm_step_fn=LM.lm_step,
        )
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)

    def test_biased_lm_changes_hypotheses(self):
        params, enc, enc_mask, keys = setup(3)
        lm_params = LM.init_lm(jax.random.PRNGKey(10), CFG.vocab_size, 8, 12)
        # bias the LM hard toward token 7
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
        assert (b == 7).sum() > (a == 7).sum()
