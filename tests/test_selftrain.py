"""Offline self-training round (selftrain.py): a trained teacher decodes
an unlabeled manifest into a pseudo-labeled TRAINING manifest.

Correctness: on the overfit synthetic set the pseudo labels must match
the ground truth for most utterances; the output must be a valid training
manifest (loads through ManifestDataset); filters and --union compose.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from semi_supervised_asr_tpu.config import load_config
from semi_supervised_asr_tpu.selftrain import (
    pseudo_label_entries, read_manifest,
)
from semi_supervised_asr_tpu.training.solver import Solver

CONFIG = "configs/synthetic_smoke.yaml"


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    wd = tmp_path_factory.mktemp("st_train")
    cfg = load_config(CONFIG, [
        "data.num_synthetic_utts=16", "train.batch_size=8",
        "train.learning_rate=0.003", "train.total_steps=200",
        "train.eval_every=0", "train.ckpt_every=200", "train.log_every=100",
    ])
    solver = Solver(cfg, wd, use_mesh=False)
    solver.train()
    return solver, wd


@pytest.fixture(scope="module")
def unlabeled(trained, tmp_path_factory):
    """The training utterances written as WAVs + an UNLABELED manifest."""
    from scipy.io import wavfile

    solver, _ = trained
    d = tmp_path_factory.mktemp("st_audio")
    entries, texts = [], []
    for i in range(8):
        utt = solver.bundle.train[i]
        data = np.clip(utt.audio * 32767, -32768, 32767).astype(np.int16)
        p = d / f"utt{i}.wav"
        wavfile.write(p, solver.cfg.frontend.sample_rate, data)
        entries.append({
            "uid": f"utt{i}", "audio": p.name, "n_samples": len(utt.audio),
        })
        texts.append(utt.text)
    manifest = d / "unlabeled.jsonl"
    with open(manifest, "w") as f:
        for e in entries:
            f.write(json.dumps(e) + "\n")
    return manifest, texts


class TestSelfTrain:
    def test_pseudo_labels_match_ground_truth(self, trained, unlabeled):
        solver, _ = trained
        manifest, texts = unlabeled
        entries = read_manifest(manifest)
        labeled, stats = pseudo_label_entries(
            solver, entries, manifest.parent, mode="greedy",
        )
        assert stats["total"] == 8
        by_uid = {e["uid"]: e for e in labeled}
        matches = sum(
            by_uid[f"utt{i}"]["text"] == t
            for i, t in enumerate(texts) if f"utt{i}" in by_uid
        )
        assert matches >= 6, [(e["uid"], e["text"]) for e in labeled]
        # training-schema fields present, audio paths resolved
        for e in labeled:
            assert {"uid", "audio", "n_samples", "text",
                    "pseudo_score"} <= set(e)

    def test_output_is_a_valid_training_manifest(
        self, trained, unlabeled, tmp_path
    ):
        from semi_supervised_asr_tpu.data.corpus import ManifestDataset

        solver, _ = trained
        manifest, _ = unlabeled
        labeled, _ = pseudo_label_entries(
            solver, read_manifest(manifest), manifest.parent, mode="greedy",
        )
        out = tmp_path / "pseudo.jsonl"
        with open(out, "w") as f:
            for e in labeled:
                f.write(json.dumps(e) + "\n")
        ds = ManifestDataset(out, solver.vocab)
        assert len(ds) == len(labeled)
        utt = ds[0]
        assert utt.tokens[-1] == 2  # EOS-terminated
        assert utt.audio.shape[0] == labeled[0]["n_samples"]

    def test_filters(self, trained, unlabeled):
        solver, _ = trained
        manifest, _ = unlabeled
        entries = read_manifest(manifest)
        all_lab, _ = pseudo_label_entries(
            solver, entries, manifest.parent, mode="greedy",
        )
        scores = sorted(e["pseudo_score"] for e in all_lab)
        # absolute threshold at the median drops the lower half
        thresh = scores[len(scores) // 2]
        lab, stats = pseudo_label_entries(
            solver, entries, manifest.parent, mode="greedy",
            min_score=thresh,
        )
        assert stats["kept"] == len(lab) <= stats["decoded_nonempty"]
        assert all(e["pseudo_score"] >= thresh for e in lab)
        # keep-frac: exactly the top half, deterministic order
        lab2, stats2 = pseudo_label_entries(
            solver, entries, manifest.parent, mode="greedy", keep_frac=0.5,
        )
        assert stats2["kept"] == max(1, round(0.5 * stats2["after_min_score"]))
        kept_scores = {e["pseudo_score"] for e in lab2}
        assert min(kept_scores, default=0) >= scores[len(scores) // 2 - 1]
        assert [e["uid"] for e in lab2] == sorted(e["uid"] for e in lab2)

    def test_cli_with_union(self, trained, unlabeled, tmp_path):
        _, wd = trained
        manifest, texts = unlabeled
        labeled_src = tmp_path / "labeled.jsonl"
        gold = {"uid": "gold0", "audio": "x.wav", "n_samples": 100,
                "text": texts[0]}
        labeled_src.write_text(json.dumps(gold) + "\n")
        out = tmp_path / "next_round.jsonl"
        r = subprocess.run(
            [sys.executable, "-m", "semi_supervised_asr_tpu.selftrain",
             "--config", CONFIG, "--load-dir", str(wd),
             "--manifest", str(manifest), "--out", str(out),
             "--beam", "1", "--union", str(labeled_src),
             "--platform", "cpu", "data.num_synthetic_utts=16"],
            capture_output=True, text=True, timeout=560,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        lines = read_manifest(out)
        assert lines[0] == gold  # labeled manifest copied first
        assert len(lines) >= 7  # + the confident pseudo entries
        stats = json.loads(r.stdout.strip().splitlines()[-1])
        assert stats["union"] is True and stats["kept"] == len(lines) - 1
