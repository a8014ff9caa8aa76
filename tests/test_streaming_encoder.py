"""Streaming (forward-only) listener: model.enc_bidirectional=false.

The transducer family's deployment mode — frame-synchronous decode over
a causal encoder.  Checks: output dim halves to enc_hidden, CAUSALITY
(future audio cannot change past encoder frames; the only lookahead is
the pyramid fold's within-pair grouping), pad invariance, the attention
listeners reject the knob, and the streaming transducer step matches
itself under the 8-virtual-device GSPMD mesh.
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.models import listener as L
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.training import train_step as TS

# full-suite only: multi-minute fused-step / jit-heavy tests

MCFG = ModelConfig(
    n_mels=20, vocab_size=16, family="transducer",
    enc_hidden=16, enc_layers=2, enc_base_layers=1,
    enc_bidirectional=False,
    pred_hidden=16, pred_layers=1, joint_dim=16, embed_dim=8,
    attn_dim=8, attn_conv_channels=4, attn_conv_width=5,
    dec_hidden=8, compute_dtype="float32",
)


class TestStreamingListener:
    def test_output_dim_and_shapes(self):
        assert MCFG.enc_out_dim == MCFG.enc_hidden
        params = L.init_listener(jax.random.PRNGKey(0), MCFG)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.standard_normal((2, 16, 20)), jnp.float32)
        lens = jnp.asarray([16, 12], jnp.int32)
        enc, enc_lens = L.listener_apply(params, feats, lens, MCFG)
        assert enc.shape == (2, 4, 16)          # T/4, H (not 2H)
        np.testing.assert_array_equal(np.asarray(enc_lens), [4, 3])

    def test_causality(self):
        """Perturbing audio frames >= t0 must not change encoder frames
        that only cover input frames < t0 (reduction-aligned)."""
        params = L.init_listener(jax.random.PRNGKey(1), MCFG)
        rng = np.random.default_rng(1)
        t, red = 32, MCFG.time_reduction
        feats = rng.standard_normal((1, t, 20)).astype(np.float32)
        lens = jnp.asarray([t], jnp.int32)
        enc_a, _ = L.listener_apply(params, jnp.asarray(feats), lens, MCFG)
        for t0 in (8, 16, 24):
            pert = feats.copy()
            pert[:, t0:] += rng.standard_normal(
                (1, t - t0, 20)
            ).astype(np.float32)
            enc_b, _ = L.listener_apply(
                params, jnp.asarray(pert), lens, MCFG
            )
            k = t0 // red
            np.testing.assert_allclose(
                np.asarray(enc_a)[:, :k], np.asarray(enc_b)[:, :k],
                rtol=1e-5, atol=1e-6,
                err_msg=f"future frames leaked into enc[:{k}] (t0={t0})",
            )
            # sanity: the perturbation DID change later frames
            assert not np.allclose(np.asarray(enc_a)[:, k:],
                                   np.asarray(enc_b)[:, k:])

    def test_bidirectional_listener_is_not_causal(self):
        """Control: the default BiLSTM fails the same probe."""
        cfg = dc.replace(MCFG, enc_bidirectional=True)
        params = L.init_listener(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(1)
        t = 32
        feats = rng.standard_normal((1, t, 20)).astype(np.float32)
        lens = jnp.asarray([t], jnp.int32)
        enc_a, _ = L.listener_apply(params, jnp.asarray(feats), lens, cfg)
        pert = feats.copy()
        pert[:, 16:] += 1.0
        enc_b, _ = L.listener_apply(params, jnp.asarray(pert), lens, cfg)
        assert not np.allclose(np.asarray(enc_a)[:, :4],
                               np.asarray(enc_b)[:, :4])

    def test_pad_invariance(self):
        params = L.init_listener(jax.random.PRNGKey(2), MCFG)
        rng = np.random.default_rng(2)
        feats = rng.standard_normal((1, 16, 20)).astype(np.float32)
        long = np.zeros((1, 32, 20), np.float32)
        long[:, :16] = feats
        lens = jnp.asarray([16], jnp.int32)
        enc_a, la = L.listener_apply(
            params, jnp.asarray(feats), lens, MCFG
        )
        enc_b, lb = L.listener_apply(
            params, jnp.asarray(long), lens, MCFG
        )
        assert int(la[0]) == int(lb[0]) == 4
        np.testing.assert_allclose(
            np.asarray(enc_a)[:, :4], np.asarray(enc_b)[:, :4],
            rtol=1e-6,
        )

    def test_attention_archs_reject(self):
        for arch in ("transformer", "conformer"):
            cfg = dc.replace(MCFG, encoder_arch=arch, conv_subsample=2,
                             enc_heads=2, enc_ff_dim=32, enc_blocks=1)
            with pytest.raises(AssertionError, match="full-context"):
                M.init_model(jax.random.PRNGKey(0), cfg)


class TestStreamingTransducerStep:
    CFG = Config(
        frontend=FrontendConfig(spec_augment=False, cmvn="global"),
        model=dc.replace(MCFG, n_mels=80),
        objective=ObjectiveConfig(),
        train=TrainConfig(learning_rate=3e-3, grad_clip_norm=5.0,
                          batch_size=2),
    )

    def _batch(self, seed=0, b=2, s=3040, u=6):
        rng = np.random.default_rng(seed)
        audio = rng.standard_normal((b, s)).astype(np.float32) * 0.1
        alens = np.full((b,), s, np.int32)
        tokens = np.zeros((b, u), np.int32)
        for i in range(b):
            tokens[i, : u - 1] = rng.integers(4, 16, u - 1)
            tokens[i, u - 1] = 2
        real = np.ones((b,), bool)
        cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
        return audio, alens, tokens, real, cmvn

    def test_step_runs_and_learns(self):
        state = TS.init_train_state(self.CFG, jax.random.PRNGKey(0))
        step = TS.make_train_step(self.CFG)
        audio, alens, tokens, real, cmvn = self._batch()
        losses = []
        for _ in range(10):
            state, m = step(state, audio, alens, tokens, real, *cmvn)
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses

    def test_gspmd_mesh_matches_single_device(self):
        from semi_supervised_asr_tpu.parallel import mesh as MESH

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        audio, alens, tokens, real, cmvn = self._batch(1, b=8)
        state1 = TS.init_train_state(self.CFG, jax.random.PRNGKey(1))
        s1, m1 = TS.make_train_step(self.CFG)(
            state1, audio, alens, tokens, real, *cmvn
        )
        mesh = MESH.make_mesh(self.CFG.parallel, jax.devices()[:8])
        state2 = TS.init_train_state(self.CFG, jax.random.PRNGKey(1))
        args = MESH.shard_batch_arrays(
            mesh, self.CFG.parallel, audio, alens, tokens, real
        )
        s2, m2 = TS.make_train_step(self.CFG, mesh=mesh)(
            state2, *args, *cmvn
        )
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(s1.params),
                         jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4
            )

    def test_greedy_decode_runs(self):
        from semi_supervised_asr_tpu.decode.transducer_greedy import (
            transducer_greedy_from_enc,
        )
        from semi_supervised_asr_tpu.models import transducer as TD

        cfg = self.CFG.model
        params = M.init_model(jax.random.PRNGKey(2), cfg)
        rng = np.random.default_rng(2)
        feats = jnp.asarray(rng.standard_normal((2, 16, 80)), jnp.float32)
        lens = jnp.asarray([16, 12], jnp.int32)
        enc, mask = TD.encode(params, feats, lens, cfg)
        toks, score = transducer_greedy_from_enc(
            params, cfg, enc, mask, 8
        )
        assert toks.shape == (2, 8)
        assert np.isfinite(np.asarray(score)).all()
