"""Feature-store training path (data.use_feature_store): H5 features ->
Solver train/decode end-to-end (reference-parity workflow, SURVEY.md §3 #3).
"""

import dataclasses

import numpy as np
import pytest

from semi_supervised_asr_tpu.config import load_config
from semi_supervised_asr_tpu.data import vocab as V
from semi_supervised_asr_tpu.data.corpus import FeatureDataset, H5FeatureStore
from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset
from semi_supervised_asr_tpu.ops import frontend_oracle as oracle
from semi_supervised_asr_tpu.training.solver import Solver

CONFIG = "configs/synthetic_smoke.yaml"


@pytest.fixture(scope="module")
def h5_dir(tmp_path_factory):
    """Synthesize train.h5/dev.h5 from the synthetic corpus via the oracle."""
    out = tmp_path_factory.mktemp("h5")
    cfg = load_config(CONFIG)
    vocab = V.timit_vocab()
    for split, n, seed in (("train", 16, 1234), ("dev", 4, 1235)):
        dcfg = dataclasses.replace(cfg.data, synthetic_seed=seed)
        ds = SyntheticDataset(vocab, dcfg, cfg.frontend, n_utts=n)
        store = H5FeatureStore(out / f"{split}.h5", "w")
        for i in range(n):
            utt = ds[i]
            feats = oracle.log_mel(
                utt.audio.astype(np.float64), cfg.frontend
            ).astype(np.float32)
            store.add(utt.uid, feats, utt.tokens, utt.text)
        store.close()
    return out


def test_feature_dataset_interface(h5_dir):
    ds = FeatureDataset(h5_dir / "train.h5", V.timit_vocab())
    assert len(ds) == 16
    utt = ds[0]
    assert utt.audio.ndim == 2 and utt.audio.shape[1] == 80
    assert utt.tokens[-1] == V.EOS
    assert ds.feat_len(0) == utt.audio.shape[0]
    assert ds.token_len(0) == len(utt.tokens)


def test_train_and_decode_from_features(h5_dir, tmp_path):
    cfg = load_config(CONFIG, [
        "data.dataset=timit",
        f"data.data_dir={h5_dir}",
        "data.use_feature_store=true",
        "train.total_steps=40",
        "train.eval_every=40",
        "train.ckpt_every=40",
        "train.log_every=20",
        "train.batch_size=8",
        "train.learning_rate=0.003",
    ])
    solver = Solver(cfg, tmp_path, use_mesh=False)
    assert solver.from_features
    result = solver.train()
    assert "dev_error" in result
    # loss must fall on the overfit set: check via metrics log
    import json

    recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")
            if '"prefix": "train"' in l]
    assert recs[-1]["loss"] < recs[0]["loss"]
    # decode path runs from features too
    rate, records, _ = solver._score_batches(
        solver.bundle.train, solver.state.params, "greedy"
    )
    assert 0.0 <= rate <= 1.0 and len(records) == 16


def test_vocab_fingerprint_guard(tmp_path):
    """A store baked under one vocab must refuse to load under another
    (token ids are vocab-relative; silent mismatch corrupts training)."""
    import pytest

    from semi_supervised_asr_tpu.data.corpus import (
        FeatureDataset, H5FeatureStore,
    )
    from semi_supervised_asr_tpu.data.vocab import char_vocab, timit_vocab

    p = tmp_path / "f.h5"
    store = H5FeatureStore(p, "w")
    store.set_vocab(timit_vocab())
    store.add("u0", np.zeros((10, 80), np.float32),
              np.asarray([5, 6, 2], np.int32), "x")
    store.close()
    # matching vocab loads fine
    FeatureDataset(p, timit_vocab())
    with pytest.raises(ValueError, match="different"):
        FeatureDataset(p, char_vocab())
    with pytest.raises(ValueError, match="different"):
        FeatureDataset(p, timit_vocab(fold48=True))
