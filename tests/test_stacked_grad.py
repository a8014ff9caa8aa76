"""Stacked-dW speller backward (model.speller_grad="stacked") parity.

The custom-VJP scan in models/speller.py reroutes the decoder cell /
w_out / d(enc) gradients from reverse-scan accumulators to post-hoc
stacked contractions.  The ONLY legitimate difference vs the plain scan
path is floating-point summation order, so every test here asserts
primal bitwise equality and gradient closeness at f32 tolerances —
across scheduled sampling, dropout, bf16 compute, the text-AE branch,
LM fusion, tied embeddings, and the 8-virtual-device GSPMD mesh.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.models import speller as S
from semi_supervised_asr_tpu.objectives import losses as LO

# full-suite only: multi-minute fused-step / jit-heavy integration
# suites (quick keeps the oracle-parity cores; pytest.ini)

CFG = ModelConfig(
    n_mels=20, vocab_size=17, enc_hidden=12, enc_layers=1,
    attn_dim=8, attn_conv_channels=3, attn_conv_width=5,
    dec_hidden=16, dec_layers=2, embed_dim=10, compute_dtype="float32",
)
B, T, U = 3, 7, 6


def _data(cfg, rng):
    enc = jnp.asarray(
        rng.standard_normal((B, T, cfg.enc_out_dim)), jnp.float32
    )
    mask = jnp.asarray(
        np.array([[1] * 7, [1] * 5 + [0] * 2, [1] * 6 + [0]]), bool
    )
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, U)), jnp.int32)
    return enc, mask, toks


def _loss(params, enc, cfg, mask, toks, tf_rate=1.0, train=False):
    logits, alphas = S.forward_teacher(
        params, cfg, enc, mask, toks, tf_rate=tf_rate,
        rng=jax.random.PRNGKey(7), train=train,
    )
    l, _ = LO.masked_ce(logits, toks)
    # quadratic alpha term exercises the alpha cotangent path too
    return l + 0.001 * jnp.sum(alphas.astype(jnp.float32) ** 2)


def _compare(cfg, tf_rate=1.0, train=False, rtol=3e-6, enc_rtol=1e-4):
    rng = np.random.default_rng(0)
    enc, mask, toks = _data(cfg, rng)
    params = S.init_speller(jax.random.PRNGKey(0), cfg)
    grads, losses = {}, {}
    for sg in ("scan", "stacked"):
        c = dc.replace(cfg, speller_grad=sg)
        losses[sg], grads[sg] = jax.value_and_grad(
            _loss, argnums=(0, 1)
        )(params, enc, c, mask, toks, tf_rate, train)
    # identical primal: the stacked fwd runs the same scan (+0 perts)
    assert float(losses["scan"]) == float(losses["stacked"])
    gp1, ge1 = grads["scan"]
    gp2, ge2 = grads["stacked"]
    scale = max(
        float(jnp.max(jnp.abs(leaf)))
        for leaf in jax.tree.leaves(gp1)
    )
    flat1 = jax.tree_util.tree_leaves_with_path(gp1)
    flat2 = jax.tree.leaves(gp2)
    for (path, a), b in zip(flat1, flat2):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0, atol=rtol * scale,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}",
        )
    esc = float(jnp.max(jnp.abs(ge1))) + 1e-12
    np.testing.assert_allclose(
        np.asarray(ge1), np.asarray(ge2), rtol=0, atol=enc_rtol * esc,
        err_msg="encoder (values) grad mismatch",
    )


class TestParity:
    def test_teacher_forced(self):
        _compare(CFG, tf_rate=1.0)

    def test_scheduled_sampling(self):
        # tf_rate<1: in-scan argmax feedback; same rng => same tokens
        _compare(CFG, tf_rate=0.5)

    def test_dropout(self):
        cfg = dc.replace(CFG, dec_dropout=0.3)
        _compare(cfg, tf_rate=0.8, train=True)

    def test_bf16_compute(self):
        cfg = dc.replace(CFG, compute_dtype="bfloat16")
        _compare(cfg, rtol=2e-2, enc_rtol=2e-2)

    def test_tied_embedding(self):
        # tied path has no w_out reroute; embedding stays on autodiff
        cfg = dc.replace(CFG, tie_embedding=True, embed_dim=16)
        _compare(cfg)

    def test_single_dec_layer(self):
        cfg = dc.replace(CFG, dec_layers=1)
        _compare(cfg)

    def test_lm_fusion_deep_frozen_lm_gets_zero_grad(self):
        cfg = dc.replace(
            CFG, lm_fusion="deep", lm_fusion_embed=8,
            lm_fusion_hidden=12, lm_fusion_layers=1,
        )
        _compare(cfg)
        # the fused LM must stay frozen under the stacked path too
        rng = np.random.default_rng(0)
        enc, mask, toks = _data(cfg, rng)
        params = S.init_speller(jax.random.PRNGKey(0), cfg)
        c = dc.replace(cfg, speller_grad="stacked")
        g = jax.grad(_loss)(params, enc, c, mask, toks)
        assert all(
            float(jnp.max(jnp.abs(leaf))) == 0.0
            for leaf in jax.tree.leaves(g["fusion_lm"])
        )

    def test_text_ae_branch(self):
        rng = np.random.default_rng(1)
        toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, U)),
                           jnp.int32)
        params = S.init_speller(jax.random.PRNGKey(0), CFG)

        def ae_loss(p, c):
            logits = S.text_autoencoder_logits(p, c, toks)
            return LO.masked_ce(logits, toks)[0]

        g1 = jax.grad(ae_loss)(params, dc.replace(CFG, speller_grad="scan"))
        g2 = jax.grad(ae_loss)(
            params, dc.replace(CFG, speller_grad="stacked")
        )
        scale = max(
            float(jnp.max(jnp.abs(leaf))) for leaf in jax.tree.leaves(g1)
        )
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=3e-6 * scale
            )


class TestMesh:
    def test_gspmd_mesh_matches_single_device(self):
        """The stacked vjp must compile and partition under GSPMD."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        cfg = dc.replace(CFG, speller_grad="stacked")
        rng = np.random.default_rng(0)
        # batch 8 so it shards over the virtual 8-device data axis
        enc = jnp.asarray(
            rng.standard_normal((8, T, cfg.enc_out_dim)), jnp.float32
        )
        mask = jnp.ones((8, T), bool)
        toks = jnp.asarray(
            rng.integers(0, cfg.vocab_size, (8, U)), jnp.int32
        )
        params = S.init_speller(jax.random.PRNGKey(0), cfg)

        def loss(p, e):
            return _loss(p, e, cfg, mask, toks)

        single = jax.jit(jax.grad(loss))(params, enc)
        mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
        sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        p_sh = jax.device_put(params, rep)
        e_sh = jax.device_put(enc, sh)
        with mesh:
            sharded = jax.jit(jax.grad(loss))(p_sh, e_sh)
        scale = max(
            float(jnp.max(jnp.abs(leaf)))
            for leaf in jax.tree.leaves(single)
        )
        for a, b in zip(jax.tree.leaves(single), jax.tree.leaves(sharded)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-5 * scale
            )


class TestSpellerUnroll:
    """model.speller_unroll: lax.scan unrolling is semantics-preserving —
    identical primal AND grads (same graph, unrolled schedule) on both
    speller_grad paths, including a U not divisible by the factor."""

    @pytest.mark.parametrize("sg", ["scan", "stacked"])
    @pytest.mark.parametrize("unroll", [2, 4])
    def test_bitwise_primal_equal_grads(self, sg, unroll):
        rng = np.random.default_rng(0)
        cfg1 = dc.replace(CFG, speller_grad=sg, speller_unroll=1)
        cfgu = dc.replace(CFG, speller_grad=sg, speller_unroll=unroll)
        enc, mask, toks = _data(cfg1, rng)
        params = S.init_speller(jax.random.PRNGKey(0), cfg1)
        l1, g1 = jax.jit(jax.value_and_grad(_loss), static_argnums=2)(
            params, enc, cfg1, mask, toks
        )
        lu, gu = jax.jit(jax.value_and_grad(_loss), static_argnums=2)(
            params, enc, cfgu, mask, toks
        )
        assert float(l1) == float(lu)
        scale = max(
            float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g1)
        ) + 1e-12
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(gu)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-6 * scale
            )
