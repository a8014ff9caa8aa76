"""model.attn_backend=flash: flash-MHSA wiring for the attention listeners.

Off-TPU, ops/flash_mhsa.mhsa computes the einsum fallback, so these CPU
tests pin (a) the fallback's equivalence to the listeners' inline
einsum-softmax math, (b) that both listener archs thread the knob and
keep the pad-invariance contract under it, and (c) the padding/segment
bridging logic (via the reference path the on-chip kernel must match —
see the TPU-marked parity test).  On-chip flash-vs-einsum parity of the
kernel itself is asserted in TestOnTPU (skipped off-TPU) and recorded
in DESIGN.md.
"""

import dataclasses as dc

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semi_supervised_asr_tpu.config import ModelConfig
from semi_supervised_asr_tpu.models import seq2seq as M
from semi_supervised_asr_tpu.ops import flash_mhsa as FM

pytestmark = pytest.mark.quick

MCFG = ModelConfig(
    n_mels=20, vocab_size=16, encoder_arch="transformer",
    enc_hidden=16, enc_heads=2, enc_ff_dim=32, enc_blocks=2,
    conv_subsample=2, conv_channels=4,
    attn_dim=16, attn_conv_channels=2, attn_conv_width=5,
    dec_hidden=16, dec_layers=1, embed_dim=16, compute_dtype="float32",
)


def _feats(rng, b=3, t=24):
    lens = np.array([24, 17, 12][:b])
    x = rng.standard_normal((b, t, MCFG.n_mels)).astype(np.float32)
    x[np.arange(t)[None, :] >= lens[:, None]] = 0.0
    return jnp.asarray(x), jnp.asarray(lens)


class TestFallbackMath:
    def test_reference_equals_inline_attention(self):
        """mhsa_reference must be the listeners' exact masked-attention
        semantics: fp32 softmax over pad-key-masked scaled scores."""
        rng = np.random.default_rng(0)
        b, t, h, d = 2, 9, 2, 4
        q, k, v = (jnp.asarray(rng.standard_normal((b, t, h, d)),
                               jnp.float32) for _ in range(3))
        mask = jnp.asarray(np.arange(t)[None, :] < np.array([[9], [5]]))
        got = FM.mhsa_reference(q, k, v, mask, sm_scale=1.0 / np.sqrt(d),
                                compute=jnp.float32)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
        scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        want = jnp.einsum(
            "bhqk,bkhd->bqhd", jax.nn.softmax(scores, axis=-1), v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_mhsa_off_tpu_is_fallback(self):
        if jax.default_backend() == "tpu":
            pytest.skip("CPU-fallback behavior")
        rng = np.random.default_rng(1)
        b, t, h, d = 2, 7, 2, 4
        q, k, v = (jnp.asarray(rng.standard_normal((b, t, h, d)),
                               jnp.float32) for _ in range(3))
        mask = jnp.ones((b, t), bool)
        a = FM.mhsa(q, k, v, mask, sm_scale=0.5, compute=jnp.float32)
        r = FM.mhsa_reference(q, k, v, mask, sm_scale=0.5,
                              compute=jnp.float32)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(r))


class TestListenerKnob:
    @pytest.mark.parametrize("arch", ["transformer", "conformer"])
    def test_flash_knob_matches_xla_on_cpu(self, arch):
        """attn_backend=flash must produce the same encodings as xla on
        CPU (fallback path; only the sm_scale mul-vs-div order differs)
        for BOTH attention listener archs — proves the knob is threaded
        end to end through encode."""
        cfg = dc.replace(MCFG, encoder_arch=arch)
        params = M.init_model(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(2)
        feats, lens = _feats(rng)
        e_xla, m1, _ = M.encode(
            params, feats, lens, dc.replace(cfg, attn_backend="xla"))
        e_fl, m2, _ = M.encode(
            params, feats, lens, dc.replace(cfg, attn_backend="flash"))
        np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
        np.testing.assert_allclose(np.asarray(e_xla), np.asarray(e_fl),
                                   atol=1e-5)

    @pytest.mark.parametrize("arch", ["transformer", "conformer"])
    def test_pad_invariance_under_flash(self, arch):
        """Re-bucketing into a longer frame bucket must not change valid
        outputs, and pad outputs stay EXACT zeros (listener contract)."""
        cfg = dc.replace(MCFG, encoder_arch=arch, attn_backend="flash")
        params = M.init_model(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(3)
        feats, lens = _feats(rng)
        e1, m1, _ = M.encode(params, feats, lens, cfg)
        pad = jnp.pad(feats, [(0, 0), (0, 8), (0, 0)])
        e2, m2, _ = M.encode(params, pad, lens, cfg)
        t1 = e1.shape[1]
        np.testing.assert_allclose(
            np.asarray(e1) * np.asarray(m1)[:, :, None],
            np.asarray(e2)[:, :t1] * np.asarray(m2)[:, :t1, None],
            atol=1e-6)
        assert np.all(np.asarray(e2)[~np.asarray(m2)] == 0.0)


class TestBridging:
    def test_pad_to_lane_multiple(self):
        assert FM._pad_len(100) == 128
        assert FM._pad_len(128) == 128
        assert FM._pad_len(200) == 256
        assert FM._pad_len(400) == 512


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Pallas flash kernel runs on TPU only")
class TestOnTPU:
    def test_kernel_matches_reference(self):
        """The Pallas kernel path (padding + segment ids) must match the
        einsum reference on valid rows, fwd and grads."""
        rng = np.random.default_rng(0)
        b, t, h, d = 4, 200, 8, 64
        q, k, v = (jnp.asarray(rng.standard_normal((b, t, h, d)),
                               jnp.float32) for _ in range(3))
        lens = np.array([200, 150, 97, 64])
        mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
        sm = float(1.0 / np.sqrt(d))

        def valid(o):
            return jnp.where(mask[:, :, None, None],
                             o.astype(jnp.float32), 0.0)

        # fp32 tolerance is bf16-grade ON PURPOSE: the kernel's q@k and
        # alpha@v run on the MXU in bf16 regardless of the input dtype
        # (measured on-chip: fp32-in maxdiff ~4.5e-3 vs the fp32 einsum
        # reference; bf16-in ~7.8e-3 — both bf16 epsilon scale).  The
        # shipped recipes run compute_dtype=bfloat16, where flash and
        # einsum match within bf16 noise.
        for compute, tol in [(jnp.float32, 2e-2), (jnp.bfloat16, 2e-2)]:
            out_f = FM.mhsa(q, k, v, mask, sm_scale=sm, compute=compute)
            out_r = FM.mhsa_reference(q, k, v, mask, sm_scale=sm,
                                      compute=compute)
            np.testing.assert_allclose(
                np.asarray(valid(out_f)), np.asarray(valid(out_r)),
                atol=tol)
            gf = jax.grad(lambda *a: jnp.sum(valid(FM.mhsa(
                *a, mask, sm_scale=sm, compute=compute)) ** 2),
                argnums=(0, 1, 2))(q, k, v)
            gr = jax.grad(lambda *a: jnp.sum(valid(FM.mhsa_reference(
                *a, mask, sm_scale=sm, compute=compute)) ** 2),
                argnums=(0, 1, 2))(q, k, v)
            for a, r in zip(gf, gr):
                scale = np.abs(np.asarray(r)).max() + 1e-9
                assert np.abs(np.asarray(a) - np.asarray(r)).max() \
                    / scale < tol * 10
