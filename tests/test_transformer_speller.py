"""Transformer speller (model.decoder_arch=transformer): the KV-cache
decode step must be EXACTLY the parallel teacher-forced pass, the batched
jit beam must match the Python oracle beam unchanged (the decode cache and
state are pytrees the lattice gather-reorders like any other leaves), and
the fused train step must learn through the one-parallel-pass CE.

The LSTM speller remains the reference-parity default (SURVEY.md §3 #10);
this file pins the extension's contract (models/transformer_speller.py).
"""

import jax
import jax.numpy as jnp
import dataclasses

import numpy as np

import pytest

from semi_supervised_asr_tpu.config import (
    Config, DataConfig, DecodeConfig, FrontendConfig, ModelConfig,
    ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.data.vocab import EOS, PAD, SOS
from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
from semi_supervised_asr_tpu.decode.greedy import greedy_decode_from_enc
from semi_supervised_asr_tpu.decode.python_beam import beam_decode_python
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.models import speller as S
from semi_supervised_asr_tpu.models import transformer_speller as TS

# quick marks are per-class: oracle-parity/semantics cores stay in the
# quick gate; the multi-minute fused-step suites are full-suite only
# (pytest.ini).

MCFG = ModelConfig(
    n_mels=8, vocab_size=10, enc_hidden=12, enc_layers=1, enc_base_layers=1,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=16, dec_layers=1, embed_dim=8, compute_dtype="float32",
    decoder_arch="transformer", dec_blocks=2, dec_heads=2, dec_ff_dim=32,
    dec_max_len=32,
)
MAX_LEN = 8


def setup(seed=0, b=3, t=8, cfg=MCFG):
    params = M.init_model(jax.random.PRNGKey(seed), cfg)
    feats = jax.random.normal(jax.random.PRNGKey(seed + 1), (b, t, cfg.n_mels))
    lens = jnp.array([t, t - 2, t - 4][:b])
    enc, enc_mask, keys = M.encode(params, feats, lens, cfg)
    return params, enc, enc_mask, keys


def strip(tokens):
    out = []
    for tok in np.asarray(tokens).tolist():
        if tok == PAD:
            continue
        out.append(tok)
        if tok == EOS:
            break
    return out


@pytest.mark.quick
class TestStepTeacherEquivalence:
    """The KV-cache decode step IS the parallel causal pass, position by
    position — the invariant everything else (beam, greedy, CE) rests on."""

    @pytest.mark.parametrize("tie", [False, True])
    def test_step_matches_parallel_pass(self, tie):
        cfg = dataclasses.replace(MCFG, tie_embedding=tie)
        params, enc, enc_mask, _ = setup(3, cfg=cfg)
        b, u = enc.shape[0], 6
        tokens_in = jax.random.randint(
            jax.random.PRNGKey(7), (b, u), 0, cfg.vocab_size
        ).at[:, 0].set(SOS)

        logits_par, alphas_par = TS.forward_teacher(
            params["speller"], cfg, enc, enc_mask, tokens_in
        )

        cross = TS.precompute_cross(params["speller"], cfg, enc)
        state = TS.init_state(b, cfg, max_steps=u)
        for i in range(u):
            state, logits_i, alpha_i = TS.step(
                params["speller"], cfg, state, tokens_in[:, i], cross,
                enc_mask,
            )
            np.testing.assert_allclose(
                np.asarray(logits_i), np.asarray(logits_par[:, i]),
                rtol=1e-5, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(alpha_i), np.asarray(alphas_par[:, i]),
                rtol=1e-5, atol=1e-6,
            )

    def test_alpha_zero_on_pad_frames(self):
        params, enc, enc_mask, _ = setup(1)
        b, u = enc.shape[0], 4
        tokens_in = jnp.full((b, u), SOS, jnp.int32)
        _, alphas = TS.forward_teacher(
            params["speller"], cfg := MCFG, enc, enc_mask, tokens_in
        )
        pad = np.asarray(alphas)[~np.asarray(
            jnp.broadcast_to(enc_mask[:, None, :], alphas.shape))]
        assert pad.max(initial=0.0) < 1e-6

    def test_dropout_train_vs_eval(self):
        cfg = dataclasses.replace(MCFG, dec_dropout=0.3)
        params, enc, enc_mask, _ = setup(5, cfg=cfg)
        tokens_in = jnp.full((enc.shape[0], 5), SOS, jnp.int32)
        le, _ = TS.forward_teacher(
            params["speller"], cfg, enc, enc_mask, tokens_in, train=False
        )
        lt, _ = TS.forward_teacher(
            params["speller"], cfg, enc, enc_mask, tokens_in,
            rng=jax.random.PRNGKey(0), train=True,
        )
        lt2, _ = TS.forward_teacher(
            params["speller"], cfg, enc, enc_mask, tokens_in,
            rng=jax.random.PRNGKey(0), train=True,
        )
        assert not np.allclose(np.asarray(le), np.asarray(lt))
        np.testing.assert_array_equal(np.asarray(lt), np.asarray(lt2))


@pytest.mark.quick
class TestBeamOracle:
    """The batched jit beam works UNCHANGED over the transformer's pytree
    cache/state (config C3's contract held across decoder archs)."""

    def test_matches_python_oracle(self):
        params, enc, enc_mask, keys = setup()
        dcfg = DecodeConfig(beam_size=3, length_penalty=1.0)
        hyps, scores = beam_decode_from_enc(
            params["speller"], MCFG, dcfg, enc, enc_mask, keys, MAX_LEN
        )
        for b in range(enc.shape[0]):
            row = lambda a: a[b : b + 1]
            ref_toks, ref_score = beam_decode_python(
                params["speller"], MCFG, dcfg,
                enc[b : b + 1], enc_mask[b : b + 1],
                jax.tree.map(row, keys), MAX_LEN,
            )
            assert strip(hyps[b]) == ref_toks, b
            np.testing.assert_allclose(float(scores[b]), ref_score, rtol=1e-4)

    def test_greedy_equals_beam_k1(self):
        params, enc, enc_mask, keys = setup(11)
        g_toks, _ = greedy_decode_from_enc(
            params["speller"], MCFG, enc, enc_mask, keys, MAX_LEN
        )
        b_toks, _ = beam_decode_from_enc(
            params["speller"], MCFG, DecodeConfig(beam_size=1),
            enc, enc_mask, keys, MAX_LEN,
        )
        for b in range(enc.shape[0]):
            assert strip(g_toks[b]) == strip(b_toks[b]), b


def _train_cfg(**obj):
    return Config(
        frontend=FrontendConfig(spec_augment=False, cmvn="global"),
        model=ModelConfig(
            n_mels=80, vocab_size=16, enc_hidden=16, enc_layers=2,
            enc_base_layers=1, attn_dim=8, attn_conv_channels=4,
            attn_conv_width=5, dec_hidden=16, dec_layers=1, embed_dim=8,
            compute_dtype="float32", decoder_arch="transformer",
            dec_blocks=2, dec_heads=2, dec_ff_dim=32, dec_max_len=32,
        ),
        objective=ObjectiveConfig(
            tf_rate_start=1.0, tf_rate_end=1.0, **obj
        ),
        train=TrainConfig(learning_rate=3e-3, grad_clip_norm=5.0,
                          batch_size=2),
    )


def _batch(seed=0, b=2, s=3040, u=6):
    rng = np.random.default_rng(seed)
    audio = rng.standard_normal((b, s)).astype(np.float32) * 0.1
    audio_lens = np.full((b,), s, np.int32)
    tokens = np.full((b, u), 0, np.int32)
    for i in range(b):
        tokens[i, : u - 1] = rng.integers(4, 16, u - 1)
        tokens[i, u - 1] = 2  # EOS
    real = np.ones((b,), bool)
    cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
    return audio, audio_lens, tokens, real, cmvn


class TestTrainStep:
    def test_supervised_overfits(self):
        from semi_supervised_asr_tpu.training import train_step as T

        cfg = _train_cfg()
        state = T.init_train_state(cfg, jax.random.PRNGKey(0))
        step = T.make_train_step(cfg)
        audio, alens, tokens, real, cmvn = _batch()
        losses = []
        for _ in range(12):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0] * 0.8, losses

    def test_semi_step_runs(self):
        from semi_supervised_asr_tpu.training import train_step as T

        cfg = _train_cfg(lambda_text_ae=0.3, lambda_pseudo=0.3,
                         use_ema_teacher=True)
        state = T.init_train_state(cfg, jax.random.PRNGKey(3))
        step = T.make_train_step(cfg, semi_supervised=True)
        audio, alens, tokens, real, cmvn = _batch(3)
        ua, ualens, _, ureal, _ = _batch(4)
        utext = np.asarray([[5, 6, 7, 2, 0, 0], [8, 9, 2, 0, 0, 0]], np.int32)
        utreal = np.ones((2,), bool)
        state, m = step(
            state, audio, alens, tokens, real,
            ua, ualens, ureal, utext, utreal, *cmvn,
        )
        for k in ("loss", "ce", "text_ae", "pseudo"):
            assert k in m and np.isfinite(float(m[k])), (k, m.get(k))

    def test_grads_reach_every_speller_leaf(self):
        from semi_supervised_asr_tpu.objectives import losses as LO

        cfg = _train_cfg()
        params = M.init_model(jax.random.PRNGKey(21), cfg.model)
        rngf = np.random.default_rng(21)
        feats = jnp.asarray(
            rngf.standard_normal((2, 16, cfg.model.n_mels)), jnp.float32
        )
        flens = jnp.asarray([16, 12])
        tokens = jnp.asarray([[5, 6, 7, 2, 0, 0], [8, 9, 10, 11, 2, 0]],
                             jnp.int32)

        def loss(p):
            l, _ = LO.supervised_loss(
                p, cfg.model, cfg.objective, feats, flens, tokens, 1.0,
                jax.random.PRNGKey(0), train=False,
            )
            return l

        g = jax.grad(loss)(params)
        flat, _ = jax.tree_util.tree_flatten_with_path(g["speller"])
        for path, leaf in flat:
            assert float(jnp.sum(jnp.abs(leaf))) > 0.0, path

    def test_text_ae_grads_skip_listener(self):
        from semi_supervised_asr_tpu.objectives import losses as LO

        cfg = _train_cfg(lambda_text_ae=1.0)
        params = M.init_model(jax.random.PRNGKey(9), cfg.model)
        text = jnp.asarray([[5, 6, 7, 2, 0, 0]], jnp.int32)

        def loss(p):
            return LO.text_ae_loss(p, cfg.model, cfg.objective, text)

        g = jax.grad(loss)(params)
        listener_norm = sum(
            float(jnp.sum(jnp.abs(x)))
            for x in jax.tree.leaves(g["listener"])
        )
        speller_norm = sum(
            float(jnp.sum(jnp.abs(x)))
            for x in jax.tree.leaves(g["speller"])
        )
        assert listener_norm == 0.0
        assert speller_norm > 0.0


@pytest.mark.quick
class TestShallowFusion:
    """decode.lm_weight shallow fusion is decoder-arch-agnostic — the LM
    steps beside the transformer speller and its state reorders on axis 1
    like under the LSTM speller (test_lm.py's behavioral contract)."""

    def _lm(self, seed=5):
        from semi_supervised_asr_tpu.models import lm as LM

        return LM.init_lm(jax.random.PRNGKey(seed), MCFG.vocab_size, 8, 12, 1)

    def test_zero_weight_is_noop(self):
        from semi_supervised_asr_tpu.models import lm as LM

        params, enc, enc_mask, keys = setup(6)
        dcfg = DecodeConfig(beam_size=3, length_penalty=1.0)
        h0, s0 = beam_decode_from_enc(
            params["speller"], MCFG, dcfg, enc, enc_mask, keys, MAX_LEN
        )
        h1, s1 = beam_decode_from_enc(
            params["speller"], MCFG,
            dataclasses.replace(dcfg, lm_weight=0.0),
            enc, enc_mask, keys, MAX_LEN,
            lm_params=self._lm(), lm_step_fn=LM.lm_step,
        )
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)

    def test_biased_lm_changes_hypotheses(self):
        from semi_supervised_asr_tpu.models import lm as LM

        params, enc, enc_mask, keys = setup(7)
        dcfg = DecodeConfig(beam_size=3, length_penalty=1.0)
        h0, _ = beam_decode_from_enc(
            params["speller"], MCFG, dcfg, enc, enc_mask, keys, MAX_LEN
        )
        lm_params = self._lm()
        # bias the LM hard toward one token via its output projection
        lm_params["b_out"] = lm_params["b_out"].at[7].add(50.0)
        h1, _ = beam_decode_from_enc(
            params["speller"], MCFG,
            dataclasses.replace(dcfg, lm_weight=0.9),
            enc, enc_mask, keys, MAX_LEN,
            lm_params=lm_params, lm_step_fn=LM.lm_step,
        )
        assert not np.array_equal(np.asarray(h0), np.asarray(h1))


class TestMWER:
    def test_train_step_with_mwer(self):
        from semi_supervised_asr_tpu.training import train_step as T

        cfg = _train_cfg(lambda_mwer=0.5, mwer_beam=2)
        state = T.init_train_state(cfg, jax.random.PRNGKey(8))
        step = T.make_train_step(cfg)
        audio, alens, tokens, real, cmvn = _batch(8)
        state, m = step(state, audio, alens, tokens, real, *cmvn)
        assert "mwer" in m and np.isfinite(float(m["mwer"]))
        assert float(m["mwer_risk"]) >= 0.0


@pytest.mark.quick
class TestGuards:
    def test_scheduled_sampling_rejected(self):
        from semi_supervised_asr_tpu.training import train_step as T

        cfg = _train_cfg().replace(
            objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=0.8)
        )
        with pytest.raises(AssertionError, match="scheduled sampling"):
            T.make_train_step(cfg)

    def test_deep_fusion_rejected_at_init(self):
        cfg = dataclasses.replace(MCFG, lm_fusion="deep")
        with pytest.raises(AssertionError, match="SHALLOW"):
            M.init_model(jax.random.PRNGKey(0), cfg)

    def test_kv_cache_over_positions_rejected(self):
        with pytest.raises(AssertionError, match="dec_max_len"):
            TS.init_state(2, MCFG, max_steps=MCFG.dec_max_len + 1)

    def test_teacher_over_positions_rejected(self):
        params, enc, enc_mask, _ = setup(1)
        toks = jnp.zeros((enc.shape[0], MCFG.dec_max_len + 1), jnp.int32)
        with pytest.raises(AssertionError, match="dec_max_len"):
            TS.forward_teacher(params["speller"], MCFG, enc, enc_mask, toks)
