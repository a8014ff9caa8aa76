"""NIST SPHERE reader (utils/sphere.py): the format real TIMIT ships as
(".WAV" files that are not RIFF).  Fixtures are spec-valid SPHERE files
written by the test; round-trips must be exact.
"""

import numpy as np
import pytest

from semi_supervised_asr_tpu.data.corpus import load_audio
from semi_supervised_asr_tpu.data.preprocess import _wav_len
from semi_supervised_asr_tpu.utils.sphere import (
    is_sphere, read_sphere, sphere_sample_count,
)


def write_sphere(path, samples_i16, sample_rate=16000, byte_format="01",
                 coding="pcm", channels=1):
    fields = [
        f"sample_count -i {len(samples_i16) // channels}",
        f"channel_count -i {channels}",
        f"sample_rate -i {sample_rate}",
        f"sample_coding -s{len(coding)} {coding}",
    ]
    if coding == "pcm":
        fields += ["sample_n_bytes -i 2",
                   f"sample_byte_format -s2 {byte_format}"]
        dt = "<i2" if byte_format == "01" else ">i2"
        payload = samples_i16.astype(dt).tobytes()
    else:  # ulaw
        fields += ["sample_n_bytes -i 1"]
        payload = samples_i16.astype(np.uint8).tobytes()
    head = "NIST_1A\n   1024\n" + "\n".join(fields) + "\nend_head\n"
    raw = head.encode("ascii")
    assert len(raw) <= 1024
    with open(path, "wb") as f:
        f.write(raw + b"\x00" * (1024 - len(raw)) + payload)


class TestSphere:
    def test_pcm_little_endian_roundtrip(self, tmp_path, rng):
        sig = (rng.standard_normal(400) * 8000).astype(np.int16)
        p = tmp_path / "a.WAV"
        write_sphere(p, sig)
        assert is_sphere(p)
        wav, sr = read_sphere(p)
        assert sr == 16000
        np.testing.assert_array_equal(
            (wav * 32768.0).astype(np.int16), sig
        )

    def test_pcm_big_endian(self, tmp_path, rng):
        sig = (rng.standard_normal(100) * 8000).astype(np.int16)
        p = tmp_path / "b.wav"
        write_sphere(p, sig, byte_format="10")
        wav, _ = read_sphere(p)
        np.testing.assert_array_equal(
            (wav * 32768.0).astype(np.int16), sig
        )

    def test_ulaw_matches_g711_reference(self, tmp_path):
        audioop = pytest.importorskip("audioop")  # stdlib G.711 oracle
        data = np.arange(256, dtype=np.uint8)
        want = np.frombuffer(
            audioop.ulaw2lin(data.tobytes(), 2), np.int16
        )
        p = tmp_path / "u.wav"
        write_sphere(p, data, coding="ulaw")
        wav, _ = read_sphere(p)
        np.testing.assert_array_equal(
            (wav * 32768.0).astype(np.int16), want
        )

    def test_load_audio_dispatch(self, tmp_path, rng):
        from scipy.io import wavfile

        sig = (rng.standard_normal(200) * 8000).astype(np.int16)
        sph, riff = tmp_path / "s.wav", tmp_path / "r.wav"
        write_sphere(sph, sig)
        wavfile.write(riff, 16000, sig)
        np.testing.assert_array_equal(load_audio(sph), load_audio(riff))

    def test_length_probe_and_count(self, tmp_path, rng):
        sig = (rng.standard_normal(321) * 100).astype(np.int16)
        p = tmp_path / "c.WAV"
        write_sphere(p, sig)
        assert sphere_sample_count(p) == 321
        assert _wav_len(p) == 321

    def test_stereo_takes_first_channel(self, tmp_path, rng):
        left = (rng.standard_normal(50) * 8000).astype(np.int16)
        right = np.zeros(50, np.int16)
        inter = np.empty(100, np.int16)
        inter[0::2], inter[1::2] = left, right
        p = tmp_path / "st.wav"
        write_sphere(p, inter, channels=2)
        wav, _ = read_sphere(p)
        np.testing.assert_array_equal(
            (wav * 32768.0).astype(np.int16), left
        )

    def test_shorten_rejected(self, tmp_path):
        p = tmp_path / "sh.wav"
        write_sphere(p, np.zeros(4, np.int16),
                     coding="pcm,embedded-shorten-v2.00")
        with pytest.raises(ValueError, match="shorten"):
            read_sphere(p)
