"""Native FLAC decoder round-trips against the pure-Python encoder fixture.

Every stream here is built by tests/flac_writer.py (spec-valid, lossless
by construction), so all assertions are EXACT integer equality — any
drift in prediction, Rice coding, wasted-bits, or stereo decorrelation
fails loudly.
"""

import numpy as np
import pytest

from tests import flac_writer as fw
from semi_supervised_asr_tpu.utils import flac


def smooth_signal(n: int, seed: int = 0, amp: int = 12000) -> np.ndarray:
    """Band-limited-ish int16 signal (fixed predictors get small residuals,
    but correctness never depends on that)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    sig = (
        amp * np.sin(2 * np.pi * t / 97.0)
        + 0.2 * amp * np.sin(2 * np.pi * t / 13.0)
        + rng.normal(0, 60, n)
    )
    return np.clip(np.round(sig), -32768, 32767).astype(np.int64)


def roundtrip(signal, **kw):
    data = fw.encode_flac(signal, **kw)
    import tempfile, pathlib
    with tempfile.TemporaryDirectory() as d:
        p = pathlib.Path(d) / "x.flac"
        p.write_bytes(data)
        samples, rate, _ = flac.read_flac_int(p)
        info = flac.stream_info(p)
    return samples, rate, info


class TestMono:
    def test_fixed_order2_exact(self):
        sig = smooth_signal(10000)
        samples, rate, info = roundtrip(sig, blocksize=4096)
        assert rate == 16000
        assert info["channels"] == 1 and info["bits"] == 16
        np.testing.assert_array_equal(samples[:, 0], sig)

    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_all_fixed_orders(self, order):
        sig = smooth_signal(1500, seed=order)
        samples, _, _ = roundtrip(sig, blocksize=512, order=order)
        np.testing.assert_array_equal(samples[:, 0], sig)

    def test_verbatim(self):
        rng = np.random.default_rng(1)
        sig = rng.integers(-32768, 32768, 700).astype(np.int64)
        samples, _, _ = roundtrip(sig, blocksize=256, kind="verbatim")
        np.testing.assert_array_equal(samples[:, 0], sig)

    def test_constant(self):
        sig = np.full(600, -12345, np.int64)
        samples, _, _ = roundtrip(sig, blocksize=192, kind="constant")
        np.testing.assert_array_equal(samples[:, 0], sig)

    def test_lpc(self):
        sig = smooth_signal(3000, seed=7)
        samples, _, _ = roundtrip(
            sig, blocksize=1024, kind="lpc",
            lpc_coeffs=[1536, -512], lpc_shift=10, lpc_precision=12,
        )
        np.testing.assert_array_equal(samples[:, 0], sig)

    def test_lpc_high_order(self):
        sig = smooth_signal(2000, seed=8)
        coeffs = [700, -300, 150, -80, 40, -20, 10, -5]
        samples, _, _ = roundtrip(
            sig, blocksize=512, kind="lpc",
            lpc_coeffs=coeffs, lpc_shift=9, lpc_precision=11,
        )
        np.testing.assert_array_equal(samples[:, 0], sig)

    def test_partitioned_residual(self):
        sig = smooth_signal(4096, seed=3)
        samples, _, _ = roundtrip(sig, blocksize=2048, partition_order=3)
        np.testing.assert_array_equal(samples[:, 0], sig)

    def test_escape_partitions(self):
        sig = smooth_signal(1024, seed=4)
        samples, _, _ = roundtrip(sig, blocksize=512, escape=True,
                                  partition_order=2)
        np.testing.assert_array_equal(samples[:, 0], sig)

    def test_wasted_bits(self):
        sig = smooth_signal(1000, seed=5) & ~np.int64(7)  # 3 zero LSBs
        samples, _, _ = roundtrip(sig, blocksize=256, wasted=3)
        np.testing.assert_array_equal(samples[:, 0], sig)

    def test_final_partial_block(self):
        sig = smooth_signal(5000)  # 5000 % 4096 != 0
        samples, _, _ = roundtrip(sig, blocksize=4096)
        assert samples.shape[0] == 5000
        np.testing.assert_array_equal(samples[:, 0], sig)

    def test_streaminfo_total_unset(self):
        sig = smooth_signal(3000, seed=6)
        samples, _, info = roundtrip(sig, blocksize=1024, report_total=False)
        assert info["n_samples"] == 0  # legitimately unknown
        np.testing.assert_array_equal(samples[:, 0], sig)

    def test_explicit_sample_size_code(self):
        sig = smooth_signal(800, seed=9)
        samples, _, _ = roundtrip(sig, blocksize=256,
                                  ss_from_streaminfo=False)
        np.testing.assert_array_equal(samples[:, 0], sig)

    @pytest.mark.parametrize("blocksize", [192, 576, 256, 1000])
    def test_blocksize_codes(self, blocksize):
        sig = smooth_signal(2 * blocksize + 17, seed=blocksize)
        samples, _, _ = roundtrip(sig, blocksize=blocksize)
        np.testing.assert_array_equal(samples[:, 0], sig)


class TestStereo:
    @pytest.mark.parametrize("assignment", [1, 8, 9, 10],
                             ids=["independent", "left-side", "side-right",
                                  "mid-side"])
    def test_channel_assignments_exact(self, assignment):
        left = smooth_signal(2500, seed=10)
        right = smooth_signal(2500, seed=11, amp=9000)
        sig = np.stack([left, right], axis=1)
        samples, _, info = roundtrip(sig, blocksize=1024,
                                     channel_assignment=assignment)
        assert info["channels"] == 2
        np.testing.assert_array_equal(samples[:, 0], left)
        np.testing.assert_array_equal(samples[:, 1], right)

    def test_mid_side_odd_sums(self):
        """(l+r) odd exercises the mid/side parity-bit reconstruction."""
        left = np.arange(-300, 300, dtype=np.int64)
        right = left + 1          # every sum is odd
        sig = np.stack([left, right], axis=1)
        samples, _, _ = roundtrip(sig, blocksize=256,
                                  channel_assignment=10, kind="verbatim")
        np.testing.assert_array_equal(samples[:, 0], left)
        np.testing.assert_array_equal(samples[:, 1], right)


class TestReadFlacFloat:
    def test_scaling_and_mono(self, tmp_path):
        sig = smooth_signal(2000)
        p = tmp_path / "m.flac"
        p.write_bytes(fw.encode_flac(sig))
        wav, rate = flac.read_flac(p)
        assert wav.dtype == np.float32 and wav.ndim == 1
        assert rate == 16000
        np.testing.assert_allclose(wav, sig / 32768.0, atol=1e-7)

    def test_stereo_averaged(self, tmp_path):
        left = smooth_signal(1200, seed=1)
        right = smooth_signal(1200, seed=2)
        p = tmp_path / "s.flac"
        p.write_bytes(fw.encode_flac(np.stack([left, right], 1)))
        wav, _ = flac.read_flac(p)
        assert wav.ndim == 1
        np.testing.assert_allclose(
            wav, (left + right) / 2 / 32768.0, atol=1e-7)

    def test_num_samples_header_only(self, tmp_path):
        sig = smooth_signal(3210)
        p = tmp_path / "n.flac"
        p.write_bytes(fw.encode_flac(sig))
        assert flac.flac_num_samples(p) == 3210

    def test_invalid_file_rejected(self, tmp_path):
        p = tmp_path / "bad.flac"
        p.write_bytes(b"not a flac stream at all" * 10)
        with pytest.raises(ValueError):
            flac.read_flac(p)


class TestNativeEncoder:
    """native/flac_encoder.cpp (VERBATIM corpus fabricator): lossless by
    construction — every stream must round-trip bit-exactly through the
    native decoder, including block-boundary and full-scale cases."""

    @pytest.mark.quick
    def test_roundtrip_exact(self, tmp_path):
        rng = np.random.default_rng(3)
        p = tmp_path / "v.flac"
        for n in (1, 15, 4095, 4096, 4097, 12288, 70001):
            sig = rng.integers(-32768, 32768, n).astype(np.int16)
            ext = np.array([-32768, 32767, 0, -1], np.int16)
            sig[:4] = ext[: min(4, n)]           # full-scale extremes
            flac.write_flac_verbatim(p, sig, 16000)
            si = flac.stream_info(p)
            assert si == {"n_samples": n, "sample_rate": 16000,
                          "channels": 1, "bits": 16}
            dec, rate, bits = flac.read_flac_int(p)
            assert (rate, bits) == (16000, 16)
            assert np.array_equal(dec[:, 0], sig.astype(np.int32))

    def test_blocksize_variants(self, tmp_path):
        rng = np.random.default_rng(4)
        sig = rng.integers(-2000, 2000, 10000).astype(np.int16)
        p = tmp_path / "b.flac"
        for bs in (256, 1024, 65535):
            flac.write_flac_verbatim(p, sig, 22050, blocksize=bs)
            dec, rate, _ = flac.read_flac_int(p)
            assert rate == 22050
            assert np.array_equal(dec[:, 0], sig.astype(np.int32))

    def test_empty_stream_header_only(self, tmp_path):
        p = tmp_path / "e.flac"
        flac.write_flac_verbatim(p, np.empty(0, np.int16))
        assert flac.stream_info(p)["n_samples"] == 0
