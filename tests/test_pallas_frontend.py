"""Fused Pallas frontend parity vs the unfused JAX path (config C2).

Runs the kernel in interpreter mode on CPU; the same code compiles on TPU
(exercised by bench.py / the TPU smoke in CI-on-hardware rounds).
"""

import jax
import jax.numpy as jnp
import numpy as np

from semi_supervised_asr_tpu.config import FrontendConfig
from semi_supervised_asr_tpu.ops import frontend as F
from semi_supervised_asr_tpu.ops import frontend_oracle as oracle
from semi_supervised_asr_tpu.ops import pallas_frontend as PF

CFG = FrontendConfig(cmvn="global", spec_augment=True)


def make_inputs(seed=0, b=3, frames=48):
    rng = np.random.default_rng(seed)
    s = (frames - 1) * CFG.hop_length
    audio = (rng.standard_normal((b, s)) * 0.1).astype(np.float32)
    lens = np.asarray([s, s - 2 * CFG.hop_length, s - 7 * CFG.hop_length])[:b]
    lm = oracle.log_mel(audio[0].astype(np.float64), CFG)
    mean, inv_std = oracle.cmvn_stats(lm)
    return (
        jnp.asarray(audio),
        jnp.asarray(lens, jnp.int32),
        jnp.asarray(mean, jnp.float32),
        jnp.asarray(inv_std, jnp.float32),
    )


class TestFusedParity:
    def test_no_augment_matches_unfused(self):
        audio, lens, mean, istd = make_inputs()
        fused, flens_f = PF.fused_log_mel_features(
            audio, lens, CFG, mean, istd, interpret=True
        )
        unfused, flens_u = F.log_mel_features(
            audio, lens, CFG, cmvn_mean=mean, cmvn_inv_std=istd
        )
        np.testing.assert_array_equal(np.asarray(flens_f), np.asarray(flens_u))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(unfused), rtol=1e-5, atol=1e-5
        )

    def test_augment_matches_unfused_same_key(self):
        audio, lens, mean, istd = make_inputs(1)
        key = jax.random.PRNGKey(42)
        fused, flens = PF.fused_log_mel_features(
            audio, lens, CFG, mean, istd, rng=key, augment=True,
            interpret=True,
        )
        unfused, _ = F.log_mel_features(
            audio, lens, CFG, cmvn_mean=mean, cmvn_inv_std=istd
        )
        unfused = F.spec_augment(key, unfused, flens, CFG)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(unfused), rtol=1e-5, atol=1e-5
        )
        # masks actually masked something
        assert (np.asarray(fused) == 0).mean() > (
            np.asarray(unfused != unfused)).mean()

    def test_pad_frames_zero(self):
        audio, lens, mean, istd = make_inputs(2)
        fused, flens = PF.fused_log_mel_features(
            audio, lens, CFG, mean, istd, interpret=True
        )
        fused = np.asarray(fused)
        for i, L in enumerate(np.asarray(flens)):
            assert np.all(fused[i, int(L):] == 0.0)

    def test_jit_compiles_interpret(self):
        audio, lens, mean, istd = make_inputs(3)
        f = jax.jit(
            lambda a, l: PF.fused_log_mel_features(
                a, l, CFG, mean, istd, interpret=True
            )[0]
        )
        out1 = f(audio, lens)
        out2 = f(audio, lens)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_time_tile_selection(self):
        assert PF._time_tile(400) in (80, 200, 100, 400 // 5) or \
            400 % PF._time_tile(400) == 0
        for t in (8, 48, 144, 208, 400, 800, 1600):
            tile = PF._time_tile(t)
            assert t % tile == 0 and tile % 8 == 0 and tile <= 256
