"""Manifest-backed corpora (TIMIT / LibriSpeech) + HDF5 feature store.

Reference counterparts: the offline preprocessing scripts and HDF5 feature
store (SURVEY.md §3 #1-#3).  The build prefers raw audio + the on-device
fused frontend (features never hit host memory, config C2), but the HDF5
store is kept for reference parity and for corpora whose audio decode is
expensive.

Manifest format: one JSON object per line —
    {"uid": ..., "audio": "path.wav|path.npy", "n_samples": int,
     "text": "..."}           (unit-tokenized by the vocab)
or  {"uid": ..., "audio": ..., "n_samples": int, "tokens": [ids...]}
Audio loading: 16-bit PCM WAV via scipy.io.wavfile, float32 .npy, or FLAC
via the framework's own native decoder (native/flac_decoder.cpp — the
image has no soundfile/librosa, so LibriSpeech's .flac is decoded
in-house; utils/flac.py).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from semi_supervised_asr_tpu.data.synthetic import Utterance
from semi_supervised_asr_tpu.data.vocab import EOS, Vocab


def load_audio(path: str | Path, prefer_i16: bool = False) -> np.ndarray:
    """Decode one utterance, reading the file exactly ONCE.

    ``prefer_i16`` (the data.audio_i16_transfer host path): sources that
    are losslessly 16-bit — WAV/SPHERE/16-bit-mono-FLAC — return native
    **int16** so decode->pad->transfer is pure integer memcpy (a ~3x cut
    in host memory traffic vs int->f32->int); anything not exactly
    representable (float .npy, 24/32-bit PCM, multichannel FLAC whose
    mono mix is a float mean) returns float32 and gets clip+round at
    batch assembly.  FLAC eligibility is decided from the STREAMINFO
    header, not by decoding twice.
    """
    path = Path(path)
    suf = path.suffix.lower()
    if suf == ".npy":
        return np.load(path).astype(np.float32)
    if suf == ".wav":
        # real TIMIT's ".WAV" files are NIST SPHERE, not RIFF — sniff
        from semi_supervised_asr_tpu.utils.sphere import is_sphere

        if is_sphere(path):
            from semi_supervised_asr_tpu.utils.sphere import read_sphere_i16

            samples, _ = read_sphere_i16(path)  # SPHERE is 16-bit at heart
            if prefer_i16:
                return samples
            return samples.astype(np.float32) / 32768.0
        from scipy.io import wavfile

        sr, data = wavfile.read(path)
        if data.dtype == np.int16:
            if prefer_i16 and data.ndim == 1:
                return data
            return data.astype(np.float32) / 32768.0
        if data.dtype == np.int32:
            return data.astype(np.float32) / 2147483648.0
        return data.astype(np.float32)
    if suf == ".flac":
        from semi_supervised_asr_tpu.utils.flac import (
            read_flac, read_flac_int, stream_info,
        )

        if prefer_i16:
            info = stream_info(path)    # header-only eligibility check
            if info["bits"] == 16 and info["channels"] == 1:
                return read_flac_int(path)[0][:, 0].astype(np.int16)
        wav, _ = read_flac(path)
        return wav
    raise ValueError(f"unsupported audio format: {path.suffix}")


def load_audio_i16(path: str | Path) -> np.ndarray | None:
    """Native int16 samples when the source is losslessly 16-bit, else None
    (see ``load_audio(prefer_i16=True)`` — this is its strict form)."""
    audio = load_audio(path, prefer_i16=True)
    return audio if audio.dtype == np.int16 else None


def vocab_fingerprint(vocab) -> str:
    """Stable id of a vocab's token->id map (size + token-list hash)."""
    import hashlib

    h = hashlib.sha1("\x00".join(vocab.tokens).encode()).hexdigest()[:12]
    return f"{vocab.unit}:{vocab.size}:{h}"


class ManifestDataset:
    """Lazy corpus over a jsonl manifest; lengths come from the manifest so
    bucketing never touches audio files."""

    def __init__(self, manifest: str | Path, vocab: Vocab,
                 prefer_i16: bool = False):
        self.root = Path(manifest).parent
        self.vocab = vocab
        # int16-native decode for the audio_i16_transfer pipeline; falls
        # back to float per-file when a source isn't losslessly 16-bit
        self.prefer_i16 = prefer_i16
        self.entries = []
        with open(manifest) as f:
            for line in f:
                line = line.strip()
                if line:
                    self.entries.append(json.loads(line))

    def __len__(self) -> int:
        return len(self.entries)

    def _tokens(self, e: dict) -> np.ndarray:
        if "tokens" in e:
            ids = list(e["tokens"])
        else:
            ids = self.vocab.encode_text(e["text"])
        if not ids or ids[-1] != EOS:
            ids = ids + [EOS]
        return np.asarray(ids, np.int32)

    def __getitem__(self, i: int) -> Utterance:
        e = self.entries[i]
        path = Path(e["audio"])
        if not path.is_absolute():
            path = self.root / path
        return Utterance(
            uid=e["uid"],
            audio=load_audio(path, prefer_i16=self.prefer_i16),
            tokens=self._tokens(e),
            text=e.get("text", ""),
        )

    def audio_len(self, i: int) -> int:
        return int(self.entries[i]["n_samples"])

    def token_len(self, i: int) -> int:
        return len(self._tokens(self.entries[i]))


class FeatureDataset:
    """Dataset over an H5FeatureStore for the precomputed-features training
    path (``data.use_feature_store``).  Lengths are FRAMES, not samples —
    the feature pipeline buckets on frames directly."""

    def __init__(self, h5_path: str | Path, vocab: Vocab):
        self.store = H5FeatureStore(h5_path)
        self.vocab = vocab
        # stores bake token IDS — a store written under a different vocab
        # (char vs fold48 vs BPE) would silently corrupt training
        stored = self.store.vocab_fingerprint()
        if stored is not None and stored != vocab_fingerprint(vocab):
            raise ValueError(
                f"{h5_path}: feature store was written with a different "
                f"vocab ({stored}) than the configured one "
                f"({vocab_fingerprint(vocab)}) — re-run preprocess with "
                "matching --fold48/--bpe/unit settings"
            )

    def __len__(self) -> int:
        return len(self.store)

    def __getitem__(self, i: int):
        uid, feats, tokens, text = self.store.get(i)
        if len(tokens) == 0 or tokens[-1] != EOS:
            tokens = np.concatenate([tokens, [EOS]]).astype(np.int32)
        return Utterance(uid=uid, audio=feats, tokens=tokens, text=text)

    def feat_len(self, i: int) -> int:
        return self.store.feat_len(i)

    def token_len(self, i: int) -> int:
        n = self.store.token_len(i)
        # +1 when the stored tokens lack the trailing EOS
        uid = self.store._uids[i]
        toks = self.store.h5[uid]["tokens"]
        return n if (n and toks[n - 1] == EOS) else n + 1


class H5FeatureStore:
    """Precomputed log-mel features + tokens in HDF5 (reference parity).

    Layout: one group per utterance — ``feats`` [T, M] float32,
    ``tokens`` [U] int32, attrs ``uid``/``text``.
    """

    def __init__(self, path: str | Path, mode: str = "r"):
        import h5py

        self.h5 = h5py.File(path, mode)
        self._uids = sorted(self.h5.keys()) if mode == "r" else []

    def set_vocab(self, vocab) -> None:
        """Record which vocab produced the stored token ids."""
        self.h5.attrs["vocab_fingerprint"] = vocab_fingerprint(vocab)

    def vocab_fingerprint(self) -> str | None:
        v = self.h5.attrs.get("vocab_fingerprint")
        return str(v) if v is not None else None

    def add(self, uid: str, feats: np.ndarray, tokens: np.ndarray,
            text: str = "") -> None:
        g = self.h5.create_group(uid)
        g.create_dataset("feats", data=np.asarray(feats, np.float32))
        g.create_dataset("tokens", data=np.asarray(tokens, np.int32))
        g.attrs["text"] = text
        self._uids.append(uid)

    def __len__(self) -> int:
        return len(self._uids)

    def get(self, i: int) -> tuple[str, np.ndarray, np.ndarray, str]:
        uid = self._uids[i]
        g = self.h5[uid]
        return uid, g["feats"][()], g["tokens"][()], str(g.attrs["text"])

    def feat_len(self, i: int) -> int:
        return self.h5[self._uids[i]]["feats"].shape[0]

    def token_len(self, i: int) -> int:
        return self.h5[self._uids[i]]["tokens"].shape[0]

    def close(self) -> None:
        self.h5.close()
