"""Transformer listener (model.encoder_arch=transformer): contract tests.

The self-attention encoder must be a drop-in for the pBLSTM behind
seq2seq.encode — same (enc, enc_mask, keys) surface, pad-invariant
outputs with EXACT zeros on pad frames (models/listener.py contract),
trainable end-to-end through the fused step, decodable by the same
beam.  Reference counterpart: none (the reference is BLSTM-only,
SURVEY.md §3 #8) — this is a TPU-first capability extension."""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.models import transformer_listener as TL
from semi_supervised_asr_tpu.ops.frontend_oracle import pad_for_batch
from semi_supervised_asr_tpu.training import train_step as TS

# full-suite only: multi-minute fused-step / jit-heavy integration
# suites (quick keeps the oracle-parity cores; pytest.ini)

MCFG = ModelConfig(
    n_mels=80, vocab_size=65, encoder_arch="transformer",
    enc_hidden=32, enc_heads=4, enc_ff_dim=128, enc_blocks=2,
    conv_subsample=2, conv_channels=8,
    attn_dim=32, attn_conv_channels=4, attn_conv_width=11,
    dec_hidden=32, dec_layers=1, embed_dim=32, compute_dtype="float32",
)
FCFG = FrontendConfig(spec_augment=False, cmvn="global")


def _cfg(model=MCFG, **train_kw):
    return Config(frontend=FCFG, model=model, objective=ObjectiveConfig(),
                  train=TrainConfig(**train_kw))


def _padded_batch(cfg, frame_bucket, lens_frames):
    rng = np.random.default_rng(0)
    hop = cfg.frontend.hop_length
    utts = [
        (rng.standard_normal(((int(l) - 1) * hop,)) * 0.1).astype(np.float32)
        for l in lens_frames
    ]
    s_len = (frame_bucket - 1) * hop
    audio = np.stack([pad_for_batch(u, s_len, cfg.frontend) for u in utts])
    alens = np.array([len(u) for u in utts], np.int32)
    return audio, alens


CMVN = (jnp.zeros(80), jnp.ones(80))


def _encode(cfg, params, frame_bucket, lens_frames, remat=False):
    audio, alens = _padded_batch(cfg, frame_bucket, lens_frames)
    feats, flens = TS.featurize(
        cfg, jnp.asarray(audio), jnp.asarray(alens), CMVN, None, False
    )
    return M.encode(params, feats, flens, cfg.model, remat=remat)


class TestContract:
    def test_shapes_and_reduction(self):
        cfg = _cfg()
        assert cfg.model.time_reduction == 4       # no pyramid: 2**conv
        params = M.init_model(jax.random.PRNGKey(0), cfg.model)
        enc, mask, keys = _encode(cfg, params, 24, [24, 16, 12, 9])
        assert enc.shape == (4, 6, cfg.model.enc_out_dim)
        # ceil-div lens through the two stride-2 blocks
        np.testing.assert_array_equal(
            np.asarray(mask).sum(1), [6, 4, 3, 3]
        )
        assert keys.shape[:2] == enc.shape[:2]

    def test_pad_invariance_and_exact_pad_zeros(self):
        """Re-bucketing the same utterances into a longer frame bucket
        must not change valid-frame outputs (beyond fp32 noise) and pad
        frames must be EXACT zeros."""
        cfg = _cfg()
        params = M.init_model(jax.random.PRNGKey(1), cfg.model)
        lens = [24, 20, 16, 12]
        e1, m1, _ = _encode(cfg, params, 24, lens)
        e2, m2, _ = _encode(cfg, params, 32, lens)
        e1, m1 = np.asarray(e1), np.asarray(m1)
        e2 = np.asarray(e2)
        t1 = e1.shape[1]
        assert np.abs(e1 - e2[:, :t1])[m1].max() < 1e-5
        assert np.abs(e1[~m1]).max() == 0.0

    def test_remat_matches(self):
        cfg = _cfg()
        params = M.init_model(jax.random.PRNGKey(2), cfg.model)
        e1, _, _ = _encode(cfg, params, 24, [24, 12])
        e2, _, _ = _encode(cfg, params, 24, [24, 12], remat=True)
        np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)

    def test_heads_must_divide_d_model(self):
        bad = dc.replace(MCFG, enc_heads=7)
        with pytest.raises(AssertionError):
            TL.init_transformer_listener(jax.random.PRNGKey(0), bad)

    def test_no_conv_stem_full_rate(self):
        cfg = _cfg(dc.replace(MCFG, conv_subsample=0))
        assert cfg.model.time_reduction == 1
        params = M.init_model(jax.random.PRNGKey(3), cfg.model)
        enc, mask, _ = _encode(cfg, params, 16, [16, 8])
        assert enc.shape[1] == 16
        np.testing.assert_array_equal(np.asarray(mask).sum(1), [16, 8])

    def test_dropout_train_only(self):
        cfg = _cfg(dc.replace(MCFG, enc_dropout=0.5))
        params = M.init_model(jax.random.PRNGKey(4), cfg.model)
        audio, alens = _padded_batch(cfg, 24, [24, 16])
        feats, flens = TS.featurize(
            cfg, jnp.asarray(audio), jnp.asarray(alens), CMVN, None, False
        )
        ap = TL.transformer_listener_apply
        eval1, _ = ap(params["listener"], feats, flens, cfg.model)
        eval2, _ = ap(params["listener"], feats, flens, cfg.model)
        np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
        tr, _ = ap(params["listener"], feats, flens, cfg.model,
                   train=True, dropout_rng=jax.random.PRNGKey(9))
        assert np.abs(np.asarray(tr) - np.asarray(eval1)).max() > 1e-3


class TestTraining:
    def test_overfit_and_decode(self):
        """Loss falls through the fused step; greedy and beam both decode
        from the same cached-encode surface (C3 reuse)."""
        cfg = _cfg(learning_rate=2e-3)
        rng = np.random.default_rng(0)
        b, f, u = 4, 24, 6
        hop = cfg.frontend.hop_length
        s = (f - 1) * hop
        audio = (rng.standard_normal((b, s)) * 0.1).astype(np.float32)
        alens = np.full((b,), s, np.int32)
        tokens = np.zeros((b, u), np.int32)
        tokens[:, : u - 1] = rng.integers(4, 65, (b, u - 1))
        tokens[:, u - 1] = 2
        real = np.ones((b,), bool)
        cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg)
        first = None
        for _ in range(40):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            first = first if first is not None else float(m["loss"])
        assert float(m["loss"]) < first * 0.5

        feats, flens = TS.featurize(
            cfg, jnp.asarray(audio), jnp.asarray(alens),
            (jnp.asarray(cmvn[0]), jnp.asarray(cmvn[1])), None, False,
        )
        enc, mask, keys = M.encode(state.params, feats, flens, cfg.model)
        from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
        from semi_supervised_asr_tpu.decode.greedy import greedy_decode_from_enc

        g, _ = greedy_decode_from_enc(
            state.params["speller"], cfg.model, enc, mask, keys, u)
        hyps, scores = beam_decode_from_enc(
            state.params["speller"], cfg.model, cfg.decode,
            enc, mask, keys, u)
        assert np.isfinite(np.asarray(scores)).all()
        assert np.asarray(g).shape == np.asarray(hyps).shape

    def test_grads_reach_every_leaf(self):
        """No dead parameters: the CE gradient must touch every listener
        leaf (wiring check for residuals/LN/conv/proj)."""
        cfg = _cfg()
        rng = np.random.default_rng(1)
        b, f, u = 2, 24, 5
        s = (f - 1) * cfg.frontend.hop_length
        audio = (rng.standard_normal((b, s)) * 0.1).astype(np.float32)
        alens = np.full((b,), s, np.int32)
        tokens = np.zeros((b, u), np.int32)
        tokens[:, : u - 1] = rng.integers(4, 65, (b, u - 1))
        tokens[:, u - 1] = 2
        params = M.init_model(jax.random.PRNGKey(5), cfg.model)
        cmvn = (jnp.zeros(80), jnp.ones(80))

        def loss_fn(p):
            feats, flens = TS.featurize(
                cfg, jnp.asarray(audio), jnp.asarray(alens), cmvn,
                None, False,
            )
            from semi_supervised_asr_tpu.objectives.losses import (
                masked_ce, shift_targets,
            )

            tin, tout = shift_targets(jnp.asarray(tokens))
            logits, _ = M.forward_teacher(
                p, cfg.model, feats, flens, tin,
                tf_rate=1.0, rng=jax.random.PRNGKey(0),
            )
            loss, _ = masked_ce(logits, tout)
            return loss

        grads = jax.grad(loss_fn)(params)
        flat = jax.tree_util.tree_flatten_with_path(grads["listener"])[0]
        for path, g in flat:
            assert float(jnp.abs(g).max()) > 0.0, (
                f"zero gradient at listener{jax.tree_util.keystr(path)}"
            )
