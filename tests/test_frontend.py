"""Frontend parity: JAX stages vs the float64 numpy oracle (C2 gate).

BASELINE.json:8 — "bitwise-close to librosa/kaldi features", operationalized
as <=1e-5 relative error after fp32 rounding (SURVEY.md §7 parity protocol).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick  # core merge-gate subset (pytest.ini)

from semi_supervised_asr_tpu.config import FrontendConfig
from semi_supervised_asr_tpu.ops import frontend, frontend_oracle as oracle

CFG = FrontendConfig(spec_augment=False, cmvn="utterance")


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b) / (np.maximum(np.abs(b), 1e-3)))


def make_audio(rng, n, scale=0.1):
    # speech-ish: filtered noise + tones
    t = np.arange(n) / CFG.sample_rate
    x = rng.standard_normal(n) * scale
    x += 0.3 * np.sin(2 * np.pi * 440.0 * t) + 0.2 * np.sin(2 * np.pi * 1333.0 * t)
    return x.astype(np.float64)


class TestMelFilterbank:
    def test_slaney_shape_and_area(self):
        fb = oracle.mel_filterbank(80, 512, 16000)
        assert fb.shape == (257, 80)
        assert np.all(fb >= 0)
        # every filter has nonzero mass and bounded peak
        assert np.all(fb.sum(axis=0) > 0)

    def test_htk_vs_slaney_differ(self):
        a = oracle.mel_filterbank(40, 512, 16000, scale="slaney")
        b = oracle.mel_filterbank(40, 512, 16000, scale="htk")
        assert not np.allclose(a, b)

    def test_mel_hz_roundtrip(self):
        f = np.linspace(10, 8000, 100)
        for scale in ("slaney", "htk"):
            back = oracle.mel_to_hz(oracle.hz_to_mel(f, scale), scale)
            np.testing.assert_allclose(back, f, rtol=1e-10)


class TestFraming:
    def test_frame_count_center(self, rng):
        x = make_audio(rng, 16000)
        frames = oracle.frame_signal(x, CFG)
        assert frames.shape == (1 + 16000 // CFG.hop_length, CFG.n_fft)

    def test_jax_frames_match_oracle(self, rng):
        x = make_audio(rng, 8000)
        ref = oracle.frame_signal(x, CFG)
        got = frontend._frame(jnp.asarray(x[None], jnp.float32), CFG)[0]
        assert got.shape == ref.shape
        assert rel_err(got, ref) < 1e-5


class TestPowerSpectrum:
    def test_matches_oracle(self, rng):
        x = make_audio(rng, 8000)
        ref = oracle.power_spectrogram(x, CFG)
        got = frontend.power_spectrogram(jnp.asarray(x[None], jnp.float32), CFG)[0]
        assert got.shape == ref.shape
        assert rel_err(got, ref) < 2e-4  # fp32 fft

    def test_parseval_sanity(self, rng):
        # windowed energy should roughly match spectral energy / n_fft
        x = make_audio(rng, 4000)
        frames = oracle.frame_signal(x, CFG) * oracle.padded_window(CFG)
        ps = oracle.power_spectrogram(x, CFG)
        # rfft power counts half the spectrum; undo the one-sided fold approx
        full = 2 * ps.sum(axis=1) - ps[:, 0] - ps[:, -1]
        np.testing.assert_allclose(
            full / CFG.n_fft, (frames**2).sum(axis=1), rtol=1e-6
        )


class TestLogMel:
    def test_matches_oracle(self, rng):
        x = make_audio(rng, 8000)
        ref = oracle.log_mel(x, CFG)
        ps = frontend.power_spectrogram(jnp.asarray(x[None], jnp.float32), CFG)
        got = frontend.log_mel_from_power(ps, CFG)[0]
        assert rel_err(np.exp(got), np.exp(ref)) < 2e-4
        assert np.max(np.abs(np.asarray(got) - ref)) < 1e-3  # log-domain abs

    def test_full_frontend_utt_cmvn(self, rng):
        xs = [make_audio(rng, 8000), make_audio(rng, 6000)]
        s = max(len(x) for x in xs)
        batch = np.stack([oracle.pad_for_batch(x, s, CFG) for x in xs])
        lens = np.array([8000, 6000])
        feats, flens = frontend.log_mel_features(
            jnp.asarray(batch, jnp.float32), jnp.asarray(lens), CFG
        )
        t0 = oracle.num_frames(8000, CFG)
        t1 = oracle.num_frames(6000, CFG)
        assert int(flens[0]) == t0 and int(flens[1]) == t1
        ref1 = oracle.full_frontend(xs[1], CFG)
        got1 = np.asarray(feats[1, :t1])
        assert np.max(np.abs(got1 - ref1)) < 2e-3
        # padding frames exactly zero
        assert np.all(np.asarray(feats[1, t1:]) == 0.0)

    def test_global_cmvn(self, rng):
        x = make_audio(rng, 8000)
        cfg = FrontendConfig(spec_augment=False, cmvn="global")
        lm = oracle.log_mel(x, cfg)
        mean, inv_std = oracle.cmvn_stats(lm)
        feats, _ = frontend.log_mel_features(
            jnp.asarray(x[None], jnp.float32),
            jnp.asarray([8000]),
            cfg,
            cmvn_mean=jnp.asarray(mean, jnp.float32),
            cmvn_inv_std=jnp.asarray(inv_std, jnp.float32),
        )
        ref = oracle.apply_cmvn(lm, mean, inv_std)
        assert np.max(np.abs(np.asarray(feats[0]) - ref)) < 2e-3


class TestSpecAugment:
    def test_masks_shapes_and_bounds(self, rng):
        cfg = FrontendConfig()
        b, t, m = 4, 100, 80
        feats = jnp.ones((b, t, m))
        lens = jnp.array([100, 80, 50, 100])
        out = frontend.spec_augment(jax.random.PRNGKey(0), feats, lens, cfg)
        out = np.asarray(out)
        assert out.shape == (b, t, m)
        assert set(np.unique(out)).issubset({0.0, 1.0})
        # something was masked, but not everything
        assert 0.0 < out.mean() < 1.0

    def test_time_masks_respect_lengths(self):
        cfg = FrontendConfig(n_freq_masks=0, n_time_masks=2)
        b, t, m = 8, 100, 80
        feats = jnp.ones((b, t, m))
        lens = jnp.full((b,), 40)
        for seed in range(5):
            out = np.asarray(
                frontend.spec_augment(jax.random.PRNGKey(seed), feats, lens, cfg)
            )
            # region beyond utterance length untouched
            assert np.all(out[:, 40:, :] == 1.0)

    def test_deterministic_under_key(self):
        cfg = FrontendConfig()
        feats = jnp.ones((2, 50, 80))
        lens = jnp.array([50, 50])
        a = frontend.spec_augment(jax.random.PRNGKey(7), feats, lens, cfg)
        b = frontend.spec_augment(jax.random.PRNGKey(7), feats, lens, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestJit:
    def test_frontend_jits_once_per_shape(self, rng):
        x = jnp.asarray(make_audio(rng, 8000)[None], jnp.float32)
        lens = jnp.asarray([8000])
        f = jax.jit(lambda a, l: frontend.log_mel_features(a, l, CFG))
        out1, _ = f(x, lens)
        out2, _ = f(x, lens)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


class TestTimeWarp:
    def make(self, b=3, t=50, m=8, seed=0):
        rng = np.random.default_rng(seed)
        feats = rng.standard_normal((b, t, m)).astype(np.float32)
        lens = np.asarray([50, 37, 9], np.int32)
        return jnp.asarray(feats), jnp.asarray(lens)

    def test_off_is_identity(self):
        feats, lens = self.make()
        cfg = FrontendConfig(time_warp_param=0)
        out = frontend.time_warp(jax.random.PRNGKey(0), feats, lens, cfg)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))

    def test_properties(self):
        feats, lens = self.make()
        cfg = FrontendConfig(time_warp_param=4)
        out = np.asarray(
            frontend.time_warp(jax.random.PRNGKey(1), feats, lens, cfg)
        )
        f = np.asarray(feats)
        # pads untouched
        np.testing.assert_array_equal(out[1, 37:], f[1, 37:])
        # too-short row (9 <= 2W+1) untouched
        np.testing.assert_array_equal(out[2], f[2])
        # endpoints preserved (src(0)=0, src(L-1)=L-1)
        np.testing.assert_allclose(out[0, 0], f[0, 0], rtol=1e-6)
        np.testing.assert_allclose(out[0, 49], f[0, 49], atol=1e-5)
        np.testing.assert_allclose(out[1, 36], f[1, 36], atol=1e-5)
        # linear interpolation: values bounded by neighbor min/max
        assert out[0].min() >= f[0].min() - 1e-5
        assert out[0].max() <= f[0].max() + 1e-5
        # it actually warped something
        assert not np.allclose(out[0], f[0])

    def test_deterministic_per_key(self):
        feats, lens = self.make(seed=2)
        cfg = FrontendConfig(time_warp_param=4)
        a = frontend.time_warp(jax.random.PRNGKey(3), feats, lens, cfg)
        b = frontend.time_warp(jax.random.PRNGKey(3), feats, lens, cfg)
        c = frontend.time_warp(jax.random.PRNGKey(4), feats, lens, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.array_equal(np.asarray(a), np.asarray(c))

    def test_monotone_ramp_stays_monotone(self):
        """A linear-in-time ramp must stay nondecreasing under a monotone
        piecewise-linear time remap."""
        t = 64
        ramp = np.tile(
            np.arange(t, dtype=np.float32)[None, :, None], (1, 1, 4)
        )
        lens = np.asarray([t], np.int32)
        cfg = FrontendConfig(time_warp_param=6)
        out = np.asarray(frontend.time_warp(
            jax.random.PRNGKey(5), jnp.asarray(ramp), jnp.asarray(lens), cfg
        ))[0, :, 0]
        assert np.all(np.diff(out) >= -1e-4), out


class TestSpeedPerturb:
    """Waveform speed perturbation (frontend.speed_perturb)."""

    def make(self, b=4, s=400, seed=0):
        rng = np.random.default_rng(seed)
        lens = np.asarray([400, 301, 160, 0], np.int32)
        audio = rng.standard_normal((b, s)).astype(np.float32)
        audio *= (np.arange(s)[None, :] < lens[:, None])
        return jnp.asarray(audio), jnp.asarray(lens)

    def test_factor_one_is_identity(self):
        audio, lens = self.make()
        out, new_lens = frontend.speed_perturb(
            jax.random.PRNGKey(0), audio, lens, (1.0,)
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(audio))
        np.testing.assert_array_equal(np.asarray(new_lens), np.asarray(lens))

    def test_fast_factor_resamples_ramp(self):
        # on a linear ramp, lerp at factor s reads exactly n*s
        s_cap = 400
        ramp = np.tile(np.arange(s_cap, dtype=np.float32), (2, 1))
        lens = np.asarray([300, 300], np.int32)
        ramp *= (np.arange(s_cap)[None, :] < lens[:, None])
        out, new_lens = frontend.speed_perturb(
            jax.random.PRNGKey(0), jnp.asarray(ramp), jnp.asarray(lens),
            (1.5,),
        )
        out, new_lens = np.asarray(out), np.asarray(new_lens)
        assert new_lens.tolist() == [200, 200]
        n = np.arange(200)
        np.testing.assert_allclose(out[0, :200], n * 1.5, rtol=1e-6)
        # pad contract: beyond the new length exactly 0
        np.testing.assert_array_equal(out[:, 200:], 0.0)

    def test_slow_factor_stretches(self):
        s_cap = 400
        ramp = np.tile(np.arange(s_cap, dtype=np.float32), (1, 1))
        lens = np.asarray([160], np.int32)
        ramp *= (np.arange(s_cap)[None, :] < lens[:, None])
        out, new_lens = frontend.speed_perturb(
            jax.random.PRNGKey(3), jnp.asarray(ramp), jnp.asarray(lens),
            (0.5,),
        )
        out, new_lens = np.asarray(out), np.asarray(new_lens)
        assert new_lens.tolist() == [320]
        np.testing.assert_allclose(out[0, :318], np.arange(318) * 0.5,
                                   rtol=1e-5)

    def test_slow_factor_clamped_to_bucket(self):
        # a row already at the bucket cap cannot be slowed: the factor
        # clamps to len/S = 1.0 and the row passes through unchanged
        audio, _ = self.make()
        lens = jnp.full((4,), 400, jnp.int32)
        out, new_lens = frontend.speed_perturb(
            jax.random.PRNGKey(1), audio, lens, (0.9,)
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(audio))
        assert np.asarray(new_lens).tolist() == [400] * 4

    def test_empty_row_stays_empty(self):
        audio, lens = self.make()
        out, new_lens = frontend.speed_perturb(
            jax.random.PRNGKey(2), audio, lens, (0.9, 1.0, 1.1)
        )
        assert int(np.asarray(new_lens)[3]) == 0
        np.testing.assert_array_equal(np.asarray(out)[3], 0.0)

    def test_rows_draw_independent_factors(self):
        lens = jnp.full((64,), 300, jnp.int32)
        audio = jnp.ones((64, 400), jnp.float32)
        audio *= (jnp.arange(400)[None, :] < lens[:, None])
        _, new_lens = frontend.speed_perturb(
            jax.random.PRNGKey(4), audio, lens, (0.9, 1.0, 1.1)
        )
        # all three factor outcomes appear across 64 rows
        assert len(set(np.asarray(new_lens).tolist())) == 3

    def test_bad_factors_raise(self):
        audio, lens = self.make()
        for bad in ((), (0.0,), (-1.0, 1.0)):
            with pytest.raises(ValueError):
                frontend.speed_perturb(jax.random.PRNGKey(0), audio, lens,
                                       bad)

class TestNoiseAugment:
    """Additive noise augmentation (frontend.noise_aug_prob)."""

    def make(self, b=4, s=400, seed=0):
        rng = np.random.default_rng(seed)
        lens = np.asarray([400, 301, 160, 0], np.int32)
        audio = rng.standard_normal((b, s)).astype(np.float32)
        audio *= (np.arange(s)[None, :] < lens[:, None])
        return jnp.asarray(audio), jnp.asarray(lens)

    def test_prob_zero_is_identity(self):
        audio, lens = self.make()
        out = frontend.noise_augment(
            jax.random.PRNGKey(0), audio, lens, 0.0, (5.0, 20.0), ("white",)
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(audio))

    def test_realized_snr_is_exact(self):
        """The gain is solved in closed form, so measured SNR == drawn SNR
        (a degenerate (d, d) range pins the draw)."""
        audio, lens = self.make()
        for snr in (0.0, 10.0, 23.0):
            out = frontend.noise_augment(
                jax.random.PRNGKey(1), audio, lens, 1.0, (snr, snr),
                ("white",),
            )
            added = np.asarray(out) - np.asarray(audio)
            for r, n in enumerate(np.asarray(lens)):
                if n == 0:
                    continue
                p_sig = np.sum(np.asarray(audio)[r, :n] ** 2) / n
                p_noise = np.sum(added[r, :n] ** 2) / n
                measured = 10.0 * np.log10(p_sig / p_noise)
                np.testing.assert_allclose(measured, snr, atol=1e-3)

    def test_pad_contract_and_lengths(self):
        audio, lens = self.make()
        out = np.asarray(frontend.noise_augment(
            jax.random.PRNGKey(2), audio, lens, 1.0, (0.0, 0.0),
            ("white", "babble"),
        ))
        for r, n in enumerate(np.asarray(lens)):
            np.testing.assert_array_equal(out[r, n:], 0.0)

    def test_empty_row_passes_through(self):
        audio, lens = self.make()
        out = np.asarray(frontend.noise_augment(
            jax.random.PRNGKey(3), audio, lens, 1.0, (5.0, 5.0), ("white",)
        ))
        np.testing.assert_array_equal(out[3], 0.0)

    def test_babble_is_other_rows(self):
        """With B=2 and orthogonal supports in frequency, the babble noise
        added to row 0 must correlate with row 1, not with fresh noise."""
        s = 512
        t = np.arange(s, dtype=np.float32)
        a = np.sin(2 * np.pi * t * 0.05).astype(np.float32)
        b = np.sign(np.sin(2 * np.pi * t * 0.013)).astype(np.float32)
        audio = jnp.asarray(np.stack([a, b]))
        lens = jnp.asarray([s, s], np.int32)
        out = np.asarray(frontend.noise_augment(
            jax.random.PRNGKey(4), audio, lens, 1.0, (0.0, 0.0), ("babble",)
        ))
        added0 = out[0] - a
        # added noise on row 0 is exactly a scaled copy of row 1
        corr = np.abs(np.corrcoef(added0, b)[0, 1])
        assert corr > 0.999, corr

    def test_babble_batch_of_one_falls_back_to_white(self):
        audio = jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 300)),
            jnp.float32,
        )
        lens = jnp.asarray([300], np.int32)
        out = np.asarray(frontend.noise_augment(
            jax.random.PRNGKey(5), audio, lens, 1.0, (10.0, 10.0),
            ("babble",),
        ))
        assert not np.array_equal(out, np.asarray(audio))  # noise applied

    def test_partial_prob_leaves_some_rows_clean(self):
        lens = jnp.full((64,), 300, jnp.int32)
        audio = jnp.asarray(
            np.random.default_rng(1).standard_normal((64, 400)),
            jnp.float32,
        ) * (jnp.arange(400)[None, :] < lens[:, None])
        out = np.asarray(frontend.noise_augment(
            jax.random.PRNGKey(6), audio, lens, 0.5, (10.0, 10.0),
            ("white",),
        ))
        changed = np.any(out != np.asarray(audio), axis=1)
        assert 0 < changed.sum() < 64

    def test_bad_args_raise(self):
        audio, lens = self.make()
        for kw in (
            dict(prob=-0.1, snr_db=(5.0, 20.0), sources=("white",)),
            dict(prob=1.5, snr_db=(5.0, 20.0), sources=("white",)),
            dict(prob=0.5, snr_db=(20.0, 5.0), sources=("white",)),
            dict(prob=0.5, snr_db=(5.0, 20.0), sources=()),
            dict(prob=0.5, snr_db=(5.0, 20.0), sources=("pink",)),
        ):
            with pytest.raises(ValueError):
                frontend.noise_augment(jax.random.PRNGKey(0), audio, lens,
                                       kw["prob"], kw["snr_db"],
                                       kw["sources"])

    def test_featurize_integration(self):
        """noise applies on augmented views only (frame grid unchanged);
        the rng=None clean/eval path is bitwise-untouched."""
        from semi_supervised_asr_tpu.config import Config, DataConfig
        from semi_supervised_asr_tpu.training.train_step import featurize

        cfg = Config(
            frontend=FrontendConfig(
                spec_augment=False, cmvn="utterance", fused_pallas=False,
                noise_aug_prob=1.0, noise_snr_db=(0.0, 0.0),
            ),
            data=DataConfig(),
        )
        rng = np.random.default_rng(0)
        audio = jnp.asarray(
            rng.standard_normal((2, 6400)).astype(np.float32)
        )
        lens = jnp.asarray([6400, 3200], np.int32)
        base, base_l = featurize(cfg, audio, lens, None, None, False)
        noisy, noisy_l = featurize(
            cfg, audio, lens, None, jax.random.PRNGKey(0), True
        )
        # frame grid unchanged, features changed
        np.testing.assert_array_equal(np.asarray(noisy_l),
                                      np.asarray(base_l))
        assert not np.array_equal(np.asarray(noisy), np.asarray(base))
        # clean path bitwise-stable under the config knob
        again, _ = featurize(cfg, audio, lens, None, None, False)
        np.testing.assert_array_equal(np.asarray(again), np.asarray(base))


class TestSpeedPerturbFeaturize:
    def test_featurize_integration(self):
        """speed=True under augment changes frame lengths; speed=False and
        eval paths are untouched."""
        from semi_supervised_asr_tpu.config import Config, DataConfig
        from semi_supervised_asr_tpu.training.train_step import featurize

        cfg = Config(
            frontend=FrontendConfig(
                spec_augment=False, cmvn="utterance", fused_pallas=False,
                speed_perturb=(0.5,),
            ),
            data=DataConfig(),
        )
        rng = np.random.default_rng(0)
        audio = jnp.asarray(
            rng.standard_normal((2, 6400)).astype(np.float32)
        )
        lens = jnp.asarray([3200, 3200], np.int32)
        base, base_l = featurize(cfg, audio, lens, None, None, False)
        pert, pert_l = featurize(
            cfg, audio, lens, None, jax.random.PRNGKey(0), True, speed=True
        )
        same, same_l = featurize(
            cfg, audio, lens, None, jax.random.PRNGKey(0), True, speed=False
        )
        assert np.asarray(pert_l).tolist() != np.asarray(base_l).tolist()
        np.testing.assert_array_equal(np.asarray(same_l), np.asarray(base_l))
        np.testing.assert_array_equal(np.asarray(same), np.asarray(base))


class TestMatmulDFT:
    def test_power_spectrum_matches_rfft(self):
        cfg_fft = FrontendConfig(spec_augment=False, cmvn="none")
        cfg_mm = FrontendConfig(spec_augment=False, cmvn="none",
                                fft_backend="matmul")
        rng = np.random.default_rng(0)
        audio = jnp.asarray(rng.standard_normal((3, 4000)).astype(np.float32))
        a = np.asarray(frontend.power_spectrogram(audio, cfg_fft))
        b = np.asarray(frontend.power_spectrogram(audio, cfg_mm))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)

    def test_log_mel_close(self):
        """End metric: log-mel features agree to ~1e-4 absolute."""
        cfg_fft = FrontendConfig(spec_augment=False, cmvn="none")
        cfg_mm = FrontendConfig(spec_augment=False, cmvn="none",
                                fft_backend="matmul")
        rng = np.random.default_rng(1)
        audio = jnp.asarray(
            (rng.standard_normal((2, 6400)) * 0.3).astype(np.float32))
        lens = jnp.asarray([6400, 4000], np.int32)
        a, la = frontend.log_mel_features(audio, lens, cfg_fft, None, None)
        b, lb = frontend.log_mel_features(audio, lens, cfg_mm, None, None)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)
