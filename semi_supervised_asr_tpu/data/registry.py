"""Dataset registry: name -> (train, dev, unlabeled_audio, unlabeled_text).

``synthetic`` is always available (SURVEY.md §8.3 risk 6: no corpora in the
image, every gate has a synthetic variant).  ``timit`` / ``librispeech``
load manifest-backed corpora produced by ``data/preprocess.py`` when real
data exists on disk.
"""

from __future__ import annotations

from dataclasses import dataclass

from semi_supervised_asr_tpu.config import Config
from semi_supervised_asr_tpu.data.vocab import Vocab, char_vocab, timit_vocab
from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset


@dataclass
class DataBundle:
    vocab: Vocab
    train: object
    dev: object
    unlabeled_audio: object | None = None
    unlabeled_text: object | None = None
    test: object | None = None        # scored by --test; None -> dev


def build_vocab(cfg: Config) -> Vocab:
    if cfg.data.unit == "phone":
        return timit_vocab(fold48=cfg.data.timit_fold48)
    if cfg.data.unit == "bpe":
        from semi_supervised_asr_tpu.data.bpe import BPEVocab, default_bpe

        return (BPEVocab.load(cfg.data.bpe_path) if cfg.data.bpe_path
                else default_bpe())
    return char_vocab()


def build_datasets(cfg: Config) -> DataBundle:
    d = cfg.data
    vocab = build_vocab(cfg)
    if d.dataset == "synthetic":
        import dataclasses as dc

        n = d.num_synthetic_utts
        dev_cfg = dc.replace(d, synthetic_seed=d.synthetic_seed + 1)
        unlab_cfg = dc.replace(d, synthetic_seed=d.synthetic_seed + 2)
        text_cfg = dc.replace(d, synthetic_seed=d.synthetic_seed + 3)
        return DataBundle(
            vocab=vocab,
            train=SyntheticDataset(vocab, d, cfg.frontend, n_utts=n),
            dev=SyntheticDataset(vocab, dev_cfg, cfg.frontend,
                                 n_utts=max(n // 4, 4)),
            unlabeled_audio=SyntheticDataset(
                vocab, unlab_cfg, cfg.frontend, n_utts=n, labeled=False
            ),
            unlabeled_text=SyntheticDataset(
                vocab, text_cfg, cfg.frontend, n_utts=n
            ),
        )
    if d.dataset in ("timit", "librispeech"):
        if d.use_feature_store:
            from semi_supervised_asr_tpu.data.corpus import FeatureDataset

            def load(split):
                return FeatureDataset(f"{d.data_dir}/{split}.h5", vocab)
        else:
            from semi_supervised_asr_tpu.data.corpus import ManifestDataset

            def load(split):
                return ManifestDataset(f"{d.data_dir}/{split}.jsonl", vocab,
                                       prefer_i16=d.audio_i16_transfer)

        def load_test():
            """data.test_split is only consumed by --test; a missing
            manifest must not block training (warn instead of crash)."""
            if not d.test_split:
                return None
            from pathlib import Path

            ext = "h5" if d.use_feature_store else "jsonl"
            path = Path(d.data_dir) / f"{d.test_split}.{ext}"
            if not path.exists():
                print(f"WARNING: data.test_split={d.test_split!r} but "
                      f"{path} does not exist — --test will score dev; "
                      "add the split to preprocess --splits to fix")
                return None
            return load(d.test_split)

        return DataBundle(
            vocab=vocab,
            train=load(d.labeled_split),
            dev=load("dev"),
            test=load_test(),
            unlabeled_audio=(
                load(d.unlabeled_audio_split) if d.unlabeled_audio_split else None
            ),
            unlabeled_text=(
                load(d.unlabeled_text_split) if d.unlabeled_text_split else None
            ),
        )
    raise ValueError(f"unknown dataset {d.dataset!r}")
