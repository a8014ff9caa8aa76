"""Conformer listener (model.encoder_arch=conformer): contract tests.

The convolution-augmented attention encoder must be a drop-in for the
pBLSTM behind seq2seq.encode — same (enc, enc_mask, keys) surface,
pad-invariant outputs with EXACT zeros on pad frames (models/listener.py
contract), trainable end-to-end through the fused step, decodable by the
same beam.  The depthwise conv is the piece the plain transformer lacks
— pad-invariance specifically covers windows that straddle the pad
boundary.  Reference counterpart: none (the reference is BLSTM-only,
SURVEY.md §3 #8) — TPU-first capability extension."""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import (
    Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
)
from semi_supervised_asr_tpu.models import conformer_listener as CL
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.ops.frontend_oracle import pad_for_batch
from semi_supervised_asr_tpu.training import train_step as TS

# full-suite only: multi-minute fused-step / jit-heavy integration
# suites (quick keeps the oracle-parity cores; pytest.ini)

MCFG = ModelConfig(
    n_mels=80, vocab_size=65, encoder_arch="conformer",
    enc_hidden=32, enc_heads=4, enc_ff_dim=128, enc_blocks=2,
    conformer_conv_width=7, conv_subsample=2, conv_channels=8,
    attn_dim=32, attn_conv_channels=4, attn_conv_width=11,
    dec_hidden=32, dec_layers=1, embed_dim=32, compute_dtype="float32",
)
FCFG = FrontendConfig(spec_augment=False, cmvn="global")
CMVN = (jnp.zeros(80), jnp.ones(80))


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


def _encode(cfg, params, frame_bucket, lens_frames, remat=False):
    audio, alens = _padded_batch(cfg, frame_bucket, lens_frames)
    feats, flens = TS.featurize(
        cfg, jnp.asarray(audio), jnp.asarray(alens), CMVN, None, False
    )
    return M.encode(params, feats, flens, cfg.model, remat=remat)


def _toy_batch(cfg, rng, b=4, f=24, u=6):
    hop = cfg.frontend.hop_length
    s = (f - 1) * hop
    audio = (rng.standard_normal((b, s)) * 0.1).astype(np.float32)
    alens = np.full((b,), s, np.int32)
    tokens = np.zeros((b, u), np.int32)
    tokens[:, : u - 1] = rng.integers(4, 65, (b, u - 1))
    tokens[:, u - 1] = 2
    real = np.ones((b,), bool)
    cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))
    return audio, alens, tokens, real, cmvn


@pytest.mark.quick
class TestDepthwiseConv:
    """The conv module's shift-add depthwise conv (r2: W static shifted
    multiply-adds so the chain fuses and the VJP escapes
    lax.conv_general_dilated's mixed-dtype restriction) must equal the
    conv lowering it replaced."""

    @pytest.mark.parametrize("width", [7, 15, 4])
    def test_matches_conv_general_dilated(self, width):
        rng = np.random.default_rng(width)
        b, t, d = 3, 17, 8
        x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32)
        mask = jnp.asarray(
            np.arange(t)[None, :] < np.array([[17], [12], [9]]))
        p = {
            "ln": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "w_pw1": jnp.asarray(
                rng.standard_normal((d, 2 * d)), jnp.float32) * 0.1,
            "b_pw1": jnp.zeros((2 * d,)),
            "w_dw": jnp.asarray(
                rng.standard_normal((width, d)), jnp.float32),
            "b_dw": jnp.zeros((d,)),
            "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "w_pw2": jnp.eye(d, dtype=jnp.float32),
            "b_pw2": jnp.zeros((d,)),
        }
        # isolate the conv: drive the module, and independently rebuild
        # its conv input (LN -> pw1 -> GLU -> mask), run the lax.conv
        # lowering, and push it through the module's LN2/swish tail.
        got = CL._conv_module(p, x, mask, jnp.float32)
        h = CL._layer_norm(x, p["ln"]) @ p["w_pw1"] + p["b_pw1"]
        a, g = jnp.split(h, 2, axis=-1)
        h = jnp.where(mask[:, :, None], a * jax.nn.sigmoid(g), 0.0)
        h = jax.lax.conv_general_dilated(
            h, p["w_dw"][:, None, :], window_strides=(1,),
            padding="SAME", dimension_numbers=("NTC", "TIO", "NTC"),
            feature_group_count=d,
        ) + p["b_dw"]
        want = jax.nn.silu(CL._layer_norm(h, p["ln2"])) @ p["w_pw2"] \
            + p["b_pw2"]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5)

    def test_bf16_chain_grads_finite(self):
        """The bf16 chain (the dtype the shipped recipe runs) must
        differentiate — the lax.conv lowering it replaced could not
        (transpose-conv dtype mismatch in the VJP)."""
        rng = np.random.default_rng(0)
        d = 8
        x = jnp.asarray(rng.standard_normal((2, 12, d)), jnp.float32)
        mask = jnp.ones((2, 12), bool)
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        p = {
            "ln": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "w_pw1": jax.random.normal(ks[0], (d, 2 * d)) * 0.1,
            "b_pw1": jnp.zeros((2 * d,)),
            "w_dw": jax.random.normal(ks[1], (5, d)) * 0.1,
            "b_dw": jnp.zeros((d,)),
            "ln2": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "w_pw2": jax.random.normal(ks[2], (d, d)) * 0.1,
            "b_pw2": jnp.zeros((d,)),
        }
        loss = lambda p_: jnp.sum(
            CL._conv_module(p_, x, mask, jnp.bfloat16) ** 2)
        grads = jax.grad(loss)(p)
        flat = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in flat)
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)


class TestContract:
    def test_shapes_and_reduction(self):
        cfg = _cfg()
        assert cfg.model.time_reduction == 4       # no pyramid: 2**conv
        params = M.init_model(jax.random.PRNGKey(0), cfg.model)
        enc, mask, keys = _encode(cfg, params, 24, [24, 16, 12, 9])
        assert enc.shape == (4, 6, cfg.model.enc_out_dim)
        np.testing.assert_array_equal(
            np.asarray(mask).sum(1), [6, 4, 3, 3]
        )
        assert keys.shape[:2] == enc.shape[:2]

    def test_pad_invariance_and_exact_pad_zeros(self):
        """Re-bucketing into a longer frame bucket must not change valid
        outputs — specifically: depthwise-conv windows straddling the
        pad boundary must mix exact zeros, not pad activations."""
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
            CL.init_conformer_listener(jax.random.PRNGKey(0), bad)

    def test_rope_needs_even_head_dim(self):
        # d=48, heads=16 -> head dim 3: divides, but RoPE pairs can't
        bad = dc.replace(MCFG, enc_hidden=24, enc_heads=16)
        with pytest.raises(AssertionError, match="RoPE"):
            CL.init_conformer_listener(jax.random.PRNGKey(0), bad)

    def test_dropout_train_only(self):
        cfg = _cfg(dc.replace(MCFG, enc_dropout=0.5))
        params = M.init_model(jax.random.PRNGKey(4), cfg.model)
        audio, alens = _padded_batch(cfg, 24, [24, 16])
        feats, flens = TS.featurize(
            cfg, jnp.asarray(audio), jnp.asarray(alens), CMVN, None, False
        )
        ap = CL.conformer_listener_apply
        eval1, _ = ap(params["listener"], feats, flens, cfg.model)
        eval2, _ = ap(params["listener"], feats, flens, cfg.model)
        np.testing.assert_array_equal(np.asarray(eval1), np.asarray(eval2))
        tr, _ = ap(params["listener"], feats, flens, cfg.model,
                   train=True, dropout_rng=jax.random.PRNGKey(9))
        assert np.abs(np.asarray(tr) - np.asarray(eval1)).max() > 1e-3

    def test_rope_is_relative(self):
        """RoPE scores depend on relative offset: shifting BOTH q and k
        positions leaves q·k unchanged (up to fp noise)."""
        hd = 8
        rng = np.random.default_rng(0)
        q = rng.standard_normal((1, 1, 1, hd)).astype(np.float32)
        k = rng.standard_normal((1, 1, 1, hd)).astype(np.float32)

        def score(shift):
            ang = jnp.asarray(CL._rope_angles(12, hd))
            qr = CL._rope(jnp.asarray(q),
                          jnp.cos(ang)[shift:shift + 1],
                          jnp.sin(ang)[shift:shift + 1])
            kr = CL._rope(jnp.asarray(k),
                          jnp.cos(ang)[shift + 3:shift + 4],
                          jnp.sin(ang)[shift + 3:shift + 4])
            return float(jnp.sum(qr * kr))

        assert abs(score(0) - score(5)) < 1e-5


class TestTraining:
    def test_overfit_and_decode(self):
        """Loss falls through the fused step; greedy and beam both decode
        from the same cached-encode surface (C3 reuse)."""
        cfg = _cfg(learning_rate=2e-3)
        rng = np.random.default_rng(0)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng)
        u = tokens.shape[1]
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
        from semi_supervised_asr_tpu.decode.greedy import (
            greedy_decode_from_enc,
        )

        g, _ = greedy_decode_from_enc(
            state.params["speller"], cfg.model, enc, mask, keys, u)
        hyps, scores = beam_decode_from_enc(
            state.params["speller"], cfg.model, cfg.decode,
            enc, mask, keys, u)
        assert np.isfinite(np.asarray(scores)).all()
        assert np.asarray(g).shape == np.asarray(hyps).shape

    def test_grads_reach_every_leaf(self):
        """No dead parameters: the CE gradient must touch every listener
        leaf (wiring check for residuals/LN/GLU/depthwise/proj)."""
        cfg = _cfg()
        rng = np.random.default_rng(1)
        audio, alens, tokens, _, _ = _toy_batch(cfg, rng, b=2, u=5)
        params = M.init_model(jax.random.PRNGKey(5), cfg.model)

        def loss_fn(p):
            feats, flens = TS.featurize(
                cfg, jnp.asarray(audio), jnp.asarray(alens), CMVN,
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

    def test_gspmd_mesh_matches_single_device(self):
        """The conformer step under the 8-virtual-device data mesh equals
        the single-device step (GSPMD partitioning of conv/attention)."""
        from semi_supervised_asr_tpu.parallel import mesh as MESH

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = _cfg()
        rng = np.random.default_rng(2)
        audio, alens, tokens, real, cmvn = _toy_batch(cfg, rng, b=8)
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step1 = TS.make_train_step(cfg)
        s1, m1 = step1(state, audio, alens, tokens, real, *cmvn)

        mesh = MESH.make_mesh(cfg.parallel, jax.devices()[:8])
        state2 = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step_mesh = TS.make_train_step(cfg, mesh=mesh)
        args = MESH.shard_batch_arrays(
            mesh, cfg.parallel, audio, alens, tokens, real
        )
        s2, m2 = step_mesh(state2, *args, cmvn[0], cmvn[1])
        np.testing.assert_allclose(
            float(m1["loss"]), float(m2["loss"]), rtol=1e-5
        )
        # same tolerance as the transformer arm (test_parallel.py):
        # LN/softmax fp32 reduction-order noise amplified by Adam's
        # rescaling of tiny grads
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
            )
