"""int16 audio transfer (data.audio_i16_transfer).

The pipeline ships batch audio as int16 (half the host->device bytes)
and train_step.featurize upcasts on device.  For 16-bit PCM sources the
round trip must be EXACT: stored f32 is int/32768, the pipeline's
rint(x*32768) recovers the integer, and the device's /32768 restores the
identical float — so features, losses, and gradients are bitwise equal
to the float32-transfer path.
"""

import dataclasses as dc
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import (
    Config, DataConfig, FrontendConfig, ModelConfig, ObjectiveConfig,
    TrainConfig,
)
from semi_supervised_asr_tpu.data.bucketing import make_bucket_spec
from semi_supervised_asr_tpu.data.corpus import ManifestDataset
from semi_supervised_asr_tpu.data.pipeline import epoch_batches
from semi_supervised_asr_tpu.training import train_step as TS

# full-suite only: multi-minute fused-step / jit-heavy integration
# suites (quick keeps the oracle-parity cores; pytest.ini)

FCFG = FrontendConfig(spec_augment=False, n_fft=128, win_ms=8.0,
                      hop_ms=4.0, n_mels=12)


def _wav_corpus(root: Path, n=12, max_samples=4000):
    """16-bit PCM WAVs + manifest (the real-corpus storage format)."""
    import json

    from scipy.io import wavfile

    rng = np.random.default_rng(3)
    entries = []
    for i in range(n):
        s = int(rng.integers(max_samples // 2, max_samples))
        wav = (rng.standard_normal(s) * 5000).astype(np.int16)
        wavfile.write(root / f"u{i}.wav", 16000, wav)
        entries.append({"uid": f"u{i}", "audio": f"u{i}.wav",
                        "n_samples": s,
                        "tokens": rng.integers(4, 20, 5).tolist() + [2]})
    mp = root / "manifest.jsonl"
    with open(mp, "w") as fh:
        for e in entries:
            fh.write(json.dumps(e) + "\n")
    return mp


def _batches(mp, i16: bool, prefer_i16: bool = False):
    dcfg = DataConfig(frame_buckets=(64,), token_buckets=(8,),
                      audio_i16_transfer=i16)
    spec = make_bucket_spec(dcfg, FCFG, 8)
    ds = ManifestDataset(mp, vocab=None, prefer_i16=prefer_i16)
    return list(epoch_batches(ds, spec, FCFG, 4, seed=0, epoch=0,
                              drop_remainder=False))


class TestRoundTrip:
    def test_pcm_batch_exact(self, tmp_path):
        """int16 batches recover the PCM ints; /32768 restores the f32."""
        mp = _wav_corpus(tmp_path)
        bf = _batches(mp, i16=False)
        bi = _batches(mp, i16=True)
        assert len(bf) == len(bi)
        for a, b in zip(bf, bi):
            assert a.audio.dtype == np.float32
            assert b.audio.dtype == np.int16
            np.testing.assert_array_equal(
                np.rint(a.audio * 32768.0).astype(np.int16), b.audio
            )
            np.testing.assert_array_equal(
                b.audio.astype(np.float32) / 32768.0, a.audio
            )
            np.testing.assert_array_equal(a.tokens, b.tokens)

    def test_i16_native_decode_identical(self, tmp_path):
        """prefer_i16 (pure-integer host path) == float-decode + rint."""
        mp = _wav_corpus(tmp_path)
        via_float = _batches(mp, i16=True, prefer_i16=False)
        native = _batches(mp, i16=True, prefer_i16=True)
        for a, b in zip(via_float, native):
            np.testing.assert_array_equal(a.audio, b.audio)
            np.testing.assert_array_equal(a.audio_lens, b.audio_lens)

    def test_i16_native_all_containers(self, tmp_path):
        """WAV, NIST SPHERE, 16-bit mono FLAC all hit the int16-native
        decode, bitwise-equal to their float decode * 32768."""
        import json

        from scipy.io import wavfile

        from semi_supervised_asr_tpu.data.corpus import (
            load_audio, load_audio_i16,
        )
        from tests.flac_writer import encode_flac
        from tests.test_sphere import write_sphere

        rng = np.random.default_rng(11)
        pcm = (rng.standard_normal(3000) * 6000).astype(np.int16)
        wavfile.write(tmp_path / "a.wav", 16000, pcm)
        write_sphere(tmp_path / "b.wav", pcm)           # SPHERE named .wav
        (tmp_path / "c.flac").write_bytes(bytes(encode_flac(pcm)))
        for name in ("a.wav", "b.wav", "c.flac"):
            got = load_audio_i16(tmp_path / name)
            assert got is not None and got.dtype == np.int16, name
            np.testing.assert_array_equal(got, pcm, err_msg=name)
            np.testing.assert_array_equal(
                got.astype(np.float32) / 32768.0,
                load_audio(tmp_path / name), err_msg=name,
            )

    def test_i16_native_falls_back_on_float_sources(self, tmp_path):
        """.npy (float-origin) refuses the int16-native path."""
        import json

        from semi_supervised_asr_tpu.data.corpus import load_audio_i16

        np.save(tmp_path / "f.npy", np.zeros(100, np.float32))
        assert load_audio_i16(tmp_path / "f.npy") is None

    def test_cmvn_matches_across_dtypes(self, tmp_path):
        """Global CMVN from a prefer_i16 dataset == from the float one."""
        from semi_supervised_asr_tpu.data.pipeline import (
            compute_global_cmvn,
        )

        mp = _wav_corpus(tmp_path, n=4)
        dsf = ManifestDataset(mp, vocab=None)
        dsi = ManifestDataset(mp, vocab=None, prefer_i16=True)
        mf, sf = compute_global_cmvn(dsf, FCFG, max_utts=4)
        mi, si = compute_global_cmvn(dsi, FCFG, max_utts=4)
        np.testing.assert_array_equal(mf, mi)
        np.testing.assert_array_equal(sf, si)

    def test_float_source_clips_to_grid(self):
        """Out-of-range float audio clips instead of wrapping."""
        from semi_supervised_asr_tpu.data.pipeline import assemble_batch
        from semi_supervised_asr_tpu.data.synthetic import Utterance

        class OneUtt:
            def __getitem__(self, i):
                a = np.zeros(600, np.float32)
                a[0], a[1], a[2] = 1.5, -2.0, 0.5
                return Utterance(uid="x", audio=a,
                                 tokens=np.array([5, 2], np.int32),
                                 text="")

        dcfg = DataConfig(frame_buckets=(64,), token_buckets=(8,),
                          audio_i16_transfer=True)
        spec = make_bucket_spec(dcfg, FCFG, 8)
        bt = assemble_batch(OneUtt(), [0], 1, (64, 8), spec, FCFG)
        assert bt.audio.dtype == np.int16
        assert bt.audio[0, 0] == 32767     # +1.5 clips to the grid max
        assert bt.audio[0, 1] == -32768    # -2.0 clips to the grid min
        assert bt.audio[0, 2] == 16384     # 0.5 is on the grid


class TestDeviceParity:
    CFG = Config(
        frontend=FCFG,
        model=ModelConfig(n_mels=12, vocab_size=20, enc_hidden=8,
                          enc_layers=1, enc_base_layers=0, attn_dim=8,
                          attn_conv_channels=2, attn_conv_width=5,
                          dec_hidden=8, dec_layers=1, embed_dim=8,
                          compute_dtype="float32"),
        objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
        train=TrainConfig(learning_rate=1e-3),
    )

    def test_featurize_bitwise(self, tmp_path):
        mp = _wav_corpus(tmp_path)
        bf = _batches(mp, i16=False)[0]
        bi = _batches(mp, i16=True)[0]
        cmvn = (jnp.zeros(12), jnp.ones(12))
        f32, l32 = jax.jit(
            lambda a, al: TS.featurize(self.CFG, a, al, cmvn, None, False)
        )(bf.audio, bf.audio_lens)
        f16, l16 = jax.jit(
            lambda a, al: TS.featurize(self.CFG, a, al, cmvn, None, False)
        )(bi.audio, bi.audio_lens)
        np.testing.assert_array_equal(np.asarray(f32), np.asarray(f16))
        np.testing.assert_array_equal(np.asarray(l32), np.asarray(l16))

    def test_train_step_bitwise(self, tmp_path):
        """Full fused step: int16 batch == f32 batch, loss and params."""
        mp = _wav_corpus(tmp_path)
        bf = _batches(mp, i16=False)[0]
        bi = _batches(mp, i16=True)[0]
        cfg = dc.replace(self.CFG,
                         parallel=dc.replace(self.CFG.parallel,
                                             donate_state=False))
        step = TS.make_train_step(cfg)
        res = {}
        for tag, bt in [("f32", bf), ("i16", bi)]:
            state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
            state, m = step(state, bt.audio, bt.audio_lens, bt.tokens,
                            bt.real, jnp.zeros(12), jnp.ones(12))
            res[tag] = (float(m["loss"]),
                        jax.tree.map(np.asarray, state.params))
        assert res["f32"][0] == res["i16"][0]
        for a, b in zip(jax.tree.leaves(res["f32"][1]),
                        jax.tree.leaves(res["i16"][1])):
            np.testing.assert_array_equal(a, b)
