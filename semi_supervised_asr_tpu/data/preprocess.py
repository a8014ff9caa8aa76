"""Corpus preprocessing CLI (SURVEY.md §3 #1-#2, §4.4).

Builds jsonl manifests (+ vocab json, + optional HDF5 feature store) from
on-disk corpora:

  TIMIT:        python -m semi_supervised_asr_tpu.data.preprocess timit \
                    --root /data/TIMIT --out data/timit
  LibriSpeech:  python -m semi_supervised_asr_tpu.data.preprocess librispeech \
                    --root /data/LibriSpeech --out data/ls --splits train-clean-100,dev-clean

TIMIT transcripts come from .PHN files (61-phone inventory); LibriSpeech
from *.trans.txt (char unit).  Audio may be WAV, NPY, or FLAC —
LibriSpeech's native .flac is decoded by the framework's own C++ decoder
(native/flac_decoder.cpp via utils/flac.py; the image has no soundfile).
Manifest lengths for .flac come from the STREAMINFO header (no decode).

The heavy feature pass is optional (--features): the framework's training
path computes features on-device (config C2); precomputed HDF5 exists for
reference parity.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from semi_supervised_asr_tpu.config import FrontendConfig
from semi_supervised_asr_tpu.data.vocab import char_vocab, timit_vocab


def _wav_len(path: Path) -> int:
    from semi_supervised_asr_tpu.utils.sphere import is_sphere

    if is_sphere(path):  # real TIMIT: NIST SPHERE named .WAV
        from semi_supervised_asr_tpu.utils.sphere import sphere_sample_count

        return sphere_sample_count(path)
    from scipy.io import wavfile

    sr, data = wavfile.read(path, mmap=True)
    return int(data.shape[0])


def _audio_len(path: Path) -> int:
    if path.suffix.lower() == ".npy":
        return int(np.load(path, mmap_mode="r").shape[0])
    if path.suffix.lower() == ".flac":
        from semi_supervised_asr_tpu.utils.flac import flac_num_samples

        return flac_num_samples(path)
    return _wav_len(path)


def read_phn(path: Path) -> list[str]:
    phones = []
    for line in path.read_text().splitlines():
        parts = line.split()
        if len(parts) >= 3:
            phones.append(parts[2].lower())
    return phones


def scan_timit(root: Path, split_dir: str) -> list[dict]:
    entries = []
    base = root / split_dir
    if not base.is_dir():
        # LDC TIMIT ships UPPERCASE split dirs (TRAIN/TEST); the default
        # --splits are lowercase — resolve case-insensitively so the
        # documented command works on a case-sensitive filesystem
        for cand in (split_dir.upper(), split_dir.lower()):
            if (root / cand).is_dir():
                base = root / cand
                break
    for wav in sorted(base.rglob("*.[wW][aA][vV]")):
        phn = wav.with_suffix(".PHN")
        if not phn.exists():
            phn = wav.with_suffix(".phn")
        if not phn.exists():
            continue
        # TIMIT convention: skip dialect-calibration SA sentences in train
        if wav.stem.upper().startswith("SA"):
            continue
        phones = read_phn(phn)
        entries.append({
            "uid": f"{wav.parent.parent.name}-{wav.parent.name}-{wav.stem}",
            "audio": str(wav),
            "n_samples": _audio_len(wav),
            "text": " ".join(phones),
        })
    return entries


def scan_librispeech(root: Path, split: str) -> list[dict]:
    entries = []
    base = root / split
    for trans in sorted(base.rglob("*.trans.txt")):
        for line in trans.read_text().splitlines():
            uid, _, text = line.partition(" ")
            if not text:
                continue
            for ext in (".wav", ".npy", ".flac"):
                audio = trans.parent / f"{uid}{ext}"
                if audio.exists():
                    break
            else:
                continue
            entries.append({
                "uid": uid,
                "audio": str(audio),
                "n_samples": _audio_len(audio),
                "text": text.lower().strip(),
            })
    return entries


def write_manifest(entries: list[dict], path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")


def build_features(entries: list[dict], vocab, fcfg: FrontendConfig,
                   out: Path) -> None:
    from semi_supervised_asr_tpu.data.corpus import H5FeatureStore, load_audio
    from semi_supervised_asr_tpu.ops import frontend_oracle as oracle

    store = H5FeatureStore(out, "w")
    store.set_vocab(vocab)   # stores bake ids; guard against vocab mismatch
    for e in entries:
        audio = load_audio(e["audio"]).astype(np.float64)
        feats = oracle.log_mel(audio, fcfg).astype(np.float32)
        tokens = np.asarray(vocab.encode_text(e["text"]) + [2], np.int32)
        store.add(e["uid"], feats, tokens, e["text"])
    store.close()


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("corpus", choices=["timit", "librispeech"])
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--splits", default=None,
                   help="comma-separated; defaults: timit=train,test; "
                        "librispeech=train-clean-100,dev-clean")
    p.add_argument("--features", action="store_true",
                   help="also write HDF5 log-mel feature stores")
    p.add_argument("--bpe", type=int, default=0, metavar="N",
                   help="(librispeech) train an N-piece BPE tokenizer on "
                        "the FIRST split's transcripts -> bpe.json; with "
                        "--features, stores bake BPE ids "
                        "(use with data.unit=bpe + data.bpe_path)")
    p.add_argument("--fold48", action="store_true",
                   help="(timit) tokenize with the 48-class training fold "
                        "(data.timit_fold48 must match at train time)")
    args = p.parse_args(argv)

    root, out = Path(args.root), Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if args.corpus == "timit":
        vocab = timit_vocab(fold48=args.fold48)
        splits = (args.splits or "train,test").split(",")
        scan = lambda s: scan_timit(root, s)  # noqa: E731
    else:
        vocab = char_vocab()
        splits = (args.splits or "train-clean-100,dev-clean").split(",")
        scan = lambda s: scan_librispeech(root, s)  # noqa: E731

    vocab.save(out / "vocab.json")
    fcfg = FrontendConfig()
    for i, split in enumerate(splits):
        entries = scan(split.strip())
        name = {"test": "dev", "dev-clean": "dev"}.get(split.strip(),
                                                       split.strip())
        write_manifest(entries, out / f"{name}.jsonl")
        print(f"{split}: {len(entries)} utterances -> {out}/{name}.jsonl")
        if i == 0 and args.bpe > 0:
            assert args.corpus == "librispeech", "--bpe is for librispeech"
            from semi_supervised_asr_tpu.data.bpe import train_bpe

            bpe = train_bpe((e["text"] for e in entries), args.bpe)
            bpe.save(out / "bpe.json")
            print(f"BPE: {bpe.size} pieces "
                  f"({len(bpe.merges)} merges) -> {out}/bpe.json")
            vocab = bpe   # --features stores then bake BPE ids
        if args.features:
            build_features(entries, vocab, fcfg, out / f"{name}.h5")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
