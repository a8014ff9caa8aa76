"""Corpus layer tests: manifest dataset, wav/npy loading, HDF5 store,
TIMIT/LibriSpeech preprocess scanners on fabricated corpus trees."""

import json

import numpy as np
import pytest

from semi_supervised_asr_tpu.data import preprocess as PP
from semi_supervised_asr_tpu.data.corpus import (
    H5FeatureStore, ManifestDataset, load_audio,
)
from semi_supervised_asr_tpu.data.vocab import EOS, char_vocab, timit_vocab


def write_wav(path, n=1600, seed=0):
    from scipy.io import wavfile

    rng = np.random.default_rng(seed)
    data = (rng.standard_normal(n) * 3000).astype(np.int16)
    path.parent.mkdir(parents=True, exist_ok=True)
    wavfile.write(path, 16000, data)
    return data


class TestAudioLoading:
    def test_wav_int16_scaled(self, tmp_path):
        data = write_wav(tmp_path / "a.wav")
        audio = load_audio(tmp_path / "a.wav")
        assert audio.dtype == np.float32
        np.testing.assert_allclose(audio, data / 32768.0, atol=1e-7)

    def test_npy(self, tmp_path):
        x = np.linspace(-1, 1, 100).astype(np.float32)
        np.save(tmp_path / "a.npy", x)
        np.testing.assert_array_equal(load_audio(tmp_path / "a.npy"), x)


class TestManifestDataset:
    def test_roundtrip(self, tmp_path):
        write_wav(tmp_path / "u1.wav", 1600)
        manifest = tmp_path / "train.jsonl"
        manifest.write_text(json.dumps({
            "uid": "u1", "audio": "u1.wav", "n_samples": 1600,
            "text": "aa b ch",
        }) + "\n")
        ds = ManifestDataset(manifest, timit_vocab())
        assert len(ds) == 1
        assert ds.audio_len(0) == 1600
        utt = ds[0]
        assert utt.tokens[-1] == EOS
        assert ds.token_len(0) == 4  # 3 phones + EOS
        assert timit_vocab().decode_text(utt.tokens) == "aa b ch"

    def test_explicit_tokens(self, tmp_path):
        write_wav(tmp_path / "u2.wav", 800)
        manifest = tmp_path / "m.jsonl"
        manifest.write_text(json.dumps({
            "uid": "u2", "audio": "u2.wav", "n_samples": 800,
            "tokens": [5, 6, 7],
        }) + "\n")
        ds = ManifestDataset(manifest, timit_vocab())
        np.testing.assert_array_equal(ds[0].tokens, [5, 6, 7, EOS])


class TestH5Store:
    def test_write_read(self, tmp_path):
        p = tmp_path / "f.h5"
        store = H5FeatureStore(p, "w")
        store.add("u1", np.ones((10, 8)), np.asarray([4, 5, EOS]), "hi")
        store.close()
        r = H5FeatureStore(p)
        assert len(r) == 1
        uid, feats, tokens, text = r.get(0)
        assert uid == "u1" and text == "hi"
        assert feats.shape == (10, 8) and r.feat_len(0) == 10
        np.testing.assert_array_equal(tokens, [4, 5, EOS])
        r.close()


class TestPreprocessTimit:
    def make_tree(self, root):
        d = root / "TRAIN" / "DR1" / "FAA0"
        write_wav(d / "SI123.WAV", 2000)
        (d / "SI123.PHN").write_text("0 100 h#\n100 900 aa\n900 2000 h#\n")
        write_wav(d / "SA1.WAV", 2000)  # SA sentences skipped by convention
        (d / "SA1.PHN").write_text("0 2000 h#\n")

    def test_scan(self, tmp_path):
        self.make_tree(tmp_path)
        entries = PP.scan_timit(tmp_path, "TRAIN")
        assert len(entries) == 1
        e = entries[0]
        assert e["text"] == "h# aa h#"
        assert e["n_samples"] == 2000

    def test_cli_writes_manifest_and_vocab(self, tmp_path):
        self.make_tree(tmp_path)
        out = tmp_path / "out"
        PP.main(["timit", "--root", str(tmp_path), "--out", str(out),
                 "--splits", "TRAIN"])
        assert (out / "vocab.json").exists()
        lines = (out / "TRAIN.jsonl").read_text().strip().splitlines()
        assert len(lines) == 1
        ds = ManifestDataset(out / "TRAIN.jsonl", timit_vocab())
        assert ds[0].text == "h# aa h#"


class TestPreprocessLibrispeech:
    def test_scan_wav(self, tmp_path):
        d = tmp_path / "train-clean-100" / "19" / "198"
        d.mkdir(parents=True)
        write_wav(d / "19-198-0000.wav", 1600)
        (d / "19-198.trans.txt").write_text("19-198-0000 HELLO WORLD\n")
        entries = PP.scan_librispeech(tmp_path, "train-clean-100")
        assert len(entries) == 1
        assert entries[0]["text"] == "hello world"

    def test_scan_flac_end_to_end(self, tmp_path):
        """LibriSpeech's native format: .flac scanned (header-only length)
        -> manifest -> ManifestDataset decodes through the native decoder."""
        from tests import flac_writer as fw

        d = tmp_path / "train-clean-100" / "19" / "198"
        d.mkdir(parents=True)
        rng = np.random.default_rng(0)
        sig = np.clip(rng.normal(0, 4000, 1600), -32768, 32767).astype(
            np.int64)
        (d / "19-198-0001.flac").write_bytes(fw.encode_flac(sig))
        (d / "19-198.trans.txt").write_text("19-198-0001 FLAC ONE\n")
        entries = PP.scan_librispeech(tmp_path, "train-clean-100")
        assert len(entries) == 1
        assert entries[0]["n_samples"] == 1600
        manifest = tmp_path / "m.jsonl"
        PP.write_manifest(entries, manifest)
        ds = ManifestDataset(manifest, char_vocab())
        utt = ds[0]
        assert utt.text == "flac one"
        np.testing.assert_allclose(
            utt.audio, sig.astype(np.float32) / 32768.0, atol=1e-7)

    def test_features_store(self, tmp_path):
        d = tmp_path / "dev-clean" / "1" / "2"
        d.mkdir(parents=True)
        write_wav(d / "1-2-0000.wav", 3200)
        (d / "1-2.trans.txt").write_text("1-2-0000 AB\n")
        out = tmp_path / "out"
        PP.main(["librispeech", "--root", str(tmp_path), "--out", str(out),
                 "--splits", "dev-clean", "--features"])
        store = H5FeatureStore(out / "dev.h5")
        uid, feats, tokens, text = store.get(0)
        assert feats.shape[1] == 80
        assert text == "ab"
        v = char_vocab()
        assert v.decode_text(tokens) == "ab"
        store.close()


class TestMissingTestSplit:
    def test_missing_test_manifest_warns_not_crashes(self, tmp_path, capsys):
        """data.test_split pointing at a nonexistent manifest must not
        block training (it is only consumed by --test)."""
        import dataclasses

        from semi_supervised_asr_tpu.config import Config, DataConfig
        from semi_supervised_asr_tpu.data.registry import build_datasets

        d = tmp_path / "train-clean-100" / "1" / "2"
        d.mkdir(parents=True)
        write_wav(d / "1-2-0000.wav", 1600)
        (d / "1-2.trans.txt").write_text("1-2-0000 AB\n")
        out = tmp_path / "out"
        PP.main(["librispeech", "--root", str(tmp_path), "--out", str(out),
                 "--splits", "train-clean-100,dev-clean"])
        # dev-clean had no data -> write an empty-but-present dev manifest
        (out / "dev.jsonl").write_text(
            (out / "train-clean-100.jsonl").read_text())
        cfg = Config(data=DataConfig(
            dataset="librispeech", data_dir=str(out), unit="char",
            labeled_split="train-clean-100", test_split="test-clean",
        ))
        bundle = build_datasets(cfg)
        assert bundle.test is None
        assert "test-clean" in capsys.readouterr().out
