"""Exact mid-epoch resume (SURVEY.md §6 checkpoint row: restore
"data-iterator state"; VERDICT.md r1 missing #5).

Kill a run mid-epoch, resume from the checkpoint, and the parameter
trajectory must be BITWISE equal to the uninterrupted run: the labeled
stream fast-forwards to the exact next batch of the interrupted epoch
(plan cost only — skipped entries are never assembled), and each
unlabeled stream advances by the restored step count (one batch is
consumed per semi step).
"""

import jax
import numpy as np

from semi_supervised_asr_tpu.config import load_config
from semi_supervised_asr_tpu.data import pipeline as pipe
from semi_supervised_asr_tpu.data.bucketing import make_bucket_spec
from semi_supervised_asr_tpu.data.registry import build_datasets
from semi_supervised_asr_tpu.training.solver import Solver

CONFIG = "configs/synthetic_smoke.yaml"


def small_cfg(**overrides):
    ov = {
        "data.num_synthetic_utts": 16,
        "train.batch_size": 4,
        "train.eval_every": 0,
        "train.log_every": 100,
        "model.enc_hidden": 8,
        "model.enc_layers": 1,
        "model.enc_base_layers": 1,
    }
    ov.update(overrides)
    return load_config(CONFIG, [f"{k}={v}" for k, v in ov.items()])


def assert_params_bitwise_equal(a, b):
    for pa, pb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


class TestStreamFastForward:
    def test_epoch_batches_start_batch_is_a_suffix(self):
        cfg = small_cfg()
        bundle = build_datasets(cfg)
        spec = make_bucket_spec(cfg.data, cfg.frontend, 2)
        full = list(pipe.epoch_batches(
            bundle.train, spec, cfg.frontend, 4, 0, epoch=0))
        tail = list(pipe.epoch_batches(
            bundle.train, spec, cfg.frontend, 4, 0, epoch=0, start_batch=2))
        assert len(tail) == len(full) - 2
        for a, b in zip(full[2:], tail):
            assert a.uids == b.uids
            np.testing.assert_array_equal(a.audio, b.audio)

    def test_repeating_batches_skip_crosses_epochs(self):
        cfg = small_cfg()
        bundle = build_datasets(cfg)
        spec = make_bucket_spec(cfg.data, cfg.frontend, 2)
        ref = pipe.repeating_batches(
            bundle.train, spec, cfg.frontend, 4, 0, drop_remainder=False)
        n_skip = 6   # 16 utts / b4 = 4 batches/epoch -> lands in epoch 1
        for _ in range(n_skip):
            next(ref)
        skipped = pipe.repeating_batches(
            bundle.train, spec, cfg.frontend, 4, 0, drop_remainder=False,
            skip_batches=n_skip)
        for _ in range(5):
            a, b = next(ref), next(skipped)
            assert a.uids == b.uids

    def test_text_batches_skip_crosses_epochs(self):
        cfg = small_cfg()
        bundle = build_datasets(cfg)
        ref = pipe.text_batches(bundle.unlabeled_text, 16, 4, 0)
        n_skip = 9
        for _ in range(n_skip):
            next(ref)
        skipped = pipe.text_batches(
            bundle.unlabeled_text, 16, 4, 0, skip_batches=n_skip)
        for _ in range(5):
            (ta, ra), (tb, rb) = next(ref), next(skipped)
            np.testing.assert_array_equal(ta, tb)
            np.testing.assert_array_equal(ra, rb)


class TestExactResume:
    def test_supervised_resume_trajectory_bitwise_equal(self, tmp_path):
        """4 batches/epoch; stop at step 6 = mid-epoch-1, resume to 10 —
        params must equal the uninterrupted 10-step run bitwise."""
        base = {"train.ckpt_every": 2}
        cfg_full = small_cfg(**base, **{"train.total_steps": 10})
        s_full = Solver(cfg_full, tmp_path / "full", use_mesh=False)
        s_full.train()

        cfg_a = small_cfg(**base, **{"train.total_steps": 6})
        Solver(cfg_a, tmp_path / "split", use_mesh=False).train()
        cfg_b = small_cfg(**base, **{"train.total_steps": 10})
        s_b = Solver(cfg_b, tmp_path / "split", use_mesh=False)
        s_b.train(resume=True)

        assert int(s_b.state.step) == 10
        assert s_b.data_pos == s_full.data_pos
        assert_params_bitwise_equal(s_full.state.params, s_b.state.params)
        assert_params_bitwise_equal(
            s_full.state.opt_state, s_b.state.opt_state)

    def test_semi_resume_trajectory_bitwise_equal(self, tmp_path):
        """Semi-supervised: labeled + unlabeled-audio + unlabeled-text
        streams all continue exactly across the kill/resume boundary."""
        base = {
            "train.ckpt_every": 3,
            "objective.lambda_text_ae": 0.3,
            "objective.lambda_pseudo": 0.3,
            "objective.use_ema_teacher": "true",
        }
        cfg_full = small_cfg(**base, **{"train.total_steps": 6})
        s_full = Solver(cfg_full, tmp_path / "full", use_mesh=False)
        s_full.train()

        cfg_a = small_cfg(**base, **{"train.total_steps": 3})
        Solver(cfg_a, tmp_path / "split", use_mesh=False).train()
        cfg_b = small_cfg(**base, **{"train.total_steps": 6})
        s_b = Solver(cfg_b, tmp_path / "split", use_mesh=False)
        s_b.train(resume=True)

        assert int(s_b.state.step) == 6
        assert_params_bitwise_equal(s_full.state.params, s_b.state.params)
        assert_params_bitwise_equal(
            s_full.state.ema_params, s_b.state.ema_params)
