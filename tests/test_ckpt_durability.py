"""Checkpoint durability + workdir exclusivity (VERDICT r3 weak #1-#2).

The round-3 soak livelocked for hours because (a) a watchdog relaunch
left the previous trainer alive, (b) the two generations raced orbax
saves on one workdir, (c) the async save failures were never surfaced,
and (d) exec-restart trusted an unfinalized save and re-ran the same 900
steps forever.  These tests pin the four framework-side fixes:

* stale ``*.orbax-checkpoint-tmp`` dirs are quarantined on Checkpointer
  init and the poisoned step saves cleanly afterwards (kill-mid-save
  recovery);
* ``verify_durable`` raises :class:`CheckpointNotDurable` instead of
  letting training continue on a save that never finalized;
* a second trainer on a locked workdir fails fast (``SystemExit``)
  rather than double-writing metrics and racing saves.
"""

import jax
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import load_config
from semi_supervised_asr_tpu.training.checkpointing import (
    Checkpointer,
    CheckpointNotDurable,
)
from semi_supervised_asr_tpu.training.solver import Solver
from semi_supervised_asr_tpu.training import train_step as TS

CONFIG = "configs/synthetic_smoke.yaml"


def small_cfg(**overrides):
    ov = {
        "data.num_synthetic_utts": 8,
        "train.batch_size": 4,
        "train.total_steps": 2,
        "train.eval_every": 0,
        "train.ckpt_every": 0,
        "train.log_every": 10,
        "model.enc_hidden": 8,
        "model.enc_layers": 1,
        "model.enc_base_layers": 1,
    }
    ov.update(overrides)
    return load_config(CONFIG, [f"{k}={v}" for k, v in ov.items()])


def tiny_state(cfg):
    return TS.init_train_state(cfg, jax.random.PRNGKey(0))


class TestStaleTmpQuarantine:
    def test_stale_tmp_is_quarantined_and_step_recovers(self, tmp_path):
        """A save killed mid-flight leaves ``<step>.orbax-checkpoint-tmp``
        — the next process must quarantine it and then save that exact
        step durably (the r3 failure permanently poisoned step 5000)."""
        cfg = small_cfg()
        state = tiny_state(cfg)
        d = tmp_path / "ckpts"
        d.mkdir()
        # the artifact a SIGKILL during an async save leaves behind
        (d / "5.orbax-checkpoint-tmp").mkdir()
        (d / "5.orbax-checkpoint-tmp" / "partial").write_text("junk")

        ck = Checkpointer(d, async_save=True)
        # __init__ must NOT touch the tmp dir (advisor r4 medium): a
        # read-only Solver against a LIVE workdir would rename the live
        # trainer's in-flight save.  Writers quarantine explicitly,
        # under the workdir lock (Solver.train does).
        assert ck.quarantined == []
        assert (d / "5.orbax-checkpoint-tmp").exists()
        ck.quarantine_stale_tmp()
        assert ck.quarantined == ["5.orbax-checkpoint-tmp"]
        assert not (d / "5.orbax-checkpoint-tmp").exists()
        q = list((d / "_quarantine").iterdir())
        assert len(q) == 1 and q[0].name.startswith("5.orbax-checkpoint-tmp")

        ck.save(5, state)
        ck.verify_durable(5)          # the poisoned step is durable now
        restored, _, step = ck.restore(state)
        assert step == 5
        ck.close()

    def test_clean_dir_quarantines_nothing(self, tmp_path):
        ck = Checkpointer(tmp_path / "c")
        assert ck.quarantine_stale_tmp() == []
        assert ck.quarantined == []
        ck.close()


class TestLatestAlwaysRetained:
    def test_worsening_metric_never_deletes_the_resume_anchor(self, tmp_path):
        """THE r3 livelock root cause: best-metric retention (orbax BestN)
        deleted every post-collapse checkpoint on arrival because its
        dev_error was worse than all retained ones — latest_step() froze
        and exec-restart re-ran the same 900 steps forever.  The
        LatestN(2) ∪ BestN policy must keep the newest saves no matter
        how bad their metric is."""
        cfg = small_cfg()
        state = tiny_state(cfg)
        ck = Checkpointer(tmp_path / "c", max_to_keep=3,
                          best_metric="dev_error", async_save=False)
        # three healthy checkpoints, then a quality collapse
        for step, err in ((1, 0.10), (2, 0.09), (3, 0.08)):
            ck.save(step, state, metrics={"dev_error": err})
        for step in (4, 5):
            ck.save(step, state, metrics={"dev_error": 0.84})
            # save() self-verifies durability (sync path) — reaching here
            # means the post-collapse save survived GC
            assert ck.latest_step() == step
        steps = ck.all_steps()
        assert 5 in steps and 4 in steps, steps
        # ...and the best checkpoint is still the healthy one
        assert ck.best_step() == 3
        ck.close()

    def test_best_retention_still_bounds_the_set(self, tmp_path):
        """LatestN(2) ∪ BestN(max_to_keep) keeps at most
        max_to_keep + 2 checkpoints."""
        cfg = small_cfg()
        state = tiny_state(cfg)
        ck = Checkpointer(tmp_path / "c", max_to_keep=2,
                          best_metric="dev_error", async_save=False)
        for step in range(1, 9):
            ck.save(step, state, metrics={"dev_error": step / 10.0})
        steps = ck.all_steps()
        assert len(steps) <= 4, steps
        assert ck.latest_step() == 8
        assert ck.best_step() == 1          # lowest dev_error preserved
        ck.close()


class TestVerifyDurable:
    def test_verify_durable_passes_after_real_save(self, tmp_path):
        cfg = small_cfg()
        ck = Checkpointer(tmp_path / "c", async_save=True)
        ck.save(3, tiny_state(cfg))
        ck.verify_durable(3)
        ck.close()

    def test_verify_durable_raises_on_missing_step(self, tmp_path):
        """The exec-restart guard: if the boundary save did not finalize,
        raise loudly instead of execv'ing into a lost-work loop."""
        cfg = small_cfg()
        ck = Checkpointer(tmp_path / "c", async_save=True)
        ck.save(3, tiny_state(cfg))
        with pytest.raises(CheckpointNotDurable, match="did not finalize"):
            ck.verify_durable(4)
        ck.close()

    def test_sync_save_self_verifies(self, tmp_path):
        cfg = small_cfg()
        ck = Checkpointer(tmp_path / "c", async_save=False)
        ck.save(1, tiny_state(cfg))   # raises internally if not durable
        assert ck.latest_step() == 1
        ck.close()


class TestWorkdirLock:
    def test_second_trainer_fails_fast(self, tmp_path):
        """Two trainers on one workdir corrupted the r3 soak's
        checkpoints — the second must die with a clear message, not
        train."""
        wd = tmp_path / "wd"
        cfg = small_cfg()
        s1 = Solver(cfg, wd, use_mesh=False)
        s1._acquire_workdir_lock()
        s2 = Solver(cfg, wd, use_mesh=False)
        with pytest.raises(SystemExit, match="another trainer"):
            s2.train()
        # the first trainer keeps working: lock is held, training runs
        s1.train()
        assert int(s1.state.step) == cfg.train.total_steps

    def test_lock_released_on_solver_death(self, tmp_path):
        """flock dies with the fd: after the holder is gone a new
        trainer acquires the same workdir without manual cleanup."""
        wd = tmp_path / "wd"
        cfg = small_cfg()
        s1 = Solver(cfg, wd, use_mesh=False)
        s1.train()
        del s1                         # closes _lock_fd -> lock released
        s2 = Solver(cfg, wd, use_mesh=False)
        s2.train(resume=True)          # acquires cleanly
        assert int(s2.state.step) == cfg.train.total_steps

    def test_distinct_workdirs_do_not_collide(self, tmp_path):
        cfg = small_cfg()
        s1 = Solver(cfg, tmp_path / "a", use_mesh=False)
        s2 = Solver(cfg, tmp_path / "b", use_mesh=False)
        s1.train()
        s2.train()

    def test_lock_released_when_train_returns(self, tmp_path):
        """The lock guards a LIVE loop, not a Solver object (advisor r4
        high): a second Solver resuming the workdir while the FIRST IS
        STILL REFERENCED must acquire cleanly — flock conflicts apply
        between two fds even in one process, so a lock held past
        train()'s return breaks every in-process train-then-resume
        caller (test_tp's resume test reproduced it)."""
        wd = tmp_path / "wd"
        cfg = small_cfg()
        s1 = Solver(cfg, wd, use_mesh=False)
        s1.train()
        assert s1._lock_fd is None        # released on return
        s2 = Solver(cfg, wd, use_mesh=False)   # s1 alive — no GC rescue
        s2.train(resume=True)
        assert int(s2.state.step) == cfg.train.total_steps
        assert s1 is not None

    def test_readonly_solver_leaves_live_tmp_alone(self, tmp_path):
        """Constructing a Solver against a workdir whose trainer has a
        save IN FLIGHT (a *.orbax-checkpoint-tmp dir) must not rename
        that dir (advisor r4 medium): quarantine only runs in train(),
        under the workdir lock."""
        wd = tmp_path / "wd"
        cfg = small_cfg()
        ckdir = wd / "checkpoints"
        ckdir.mkdir(parents=True)
        live = ckdir / "7.orbax-checkpoint-tmp"
        live.mkdir()
        Solver(cfg, wd, use_mesh=False)   # e.g. decode/--test/diagnose
        assert live.exists()
        assert not (ckdir / "_quarantine").exists()


class TestKillDuringSaveSubprocess:
    @pytest.mark.runbook
    def test_sigkill_mid_save_then_resume_recovers(self, tmp_path):
        """End-to-end: SIGKILL a trainer while its async save is in
        flight, then prove a resumed run quarantines any debris and
        completes (the regression the r3 livelock demanded)."""
        import os
        import signal
        import subprocess
        import sys
        import time

        wd = tmp_path / "wd"
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)

        def cmd(*flags, **overrides):
            # --platform cpu: the axon sitecustomize overrides the
            # JAX_PLATFORMS env var, so the flag is the only reliable way
            # to keep the subprocess off the chip
            return [
                sys.executable, "-m", "semi_supervised_asr_tpu.main",
                "--config", CONFIG, "--train", "--workdir", str(wd),
                "--platform", "cpu", *flags, "--",
                "data.num_synthetic_utts=8", "train.batch_size=4",
                "train.eval_every=0", "train.log_every=1",
                "train.async_ckpt=true", "model.enc_hidden=8",
                "model.enc_layers=1", "model.enc_base_layers=1",
                *[f"{k}={v}" for k, v in overrides.items()],
            ]

        # phase 1: run with periodic saves, kill hard once a ckpt dir
        # (finalized or tmp) appears
        p = subprocess.Popen(
            cmd(**{"train.total_steps": 50, "train.ckpt_every": 2}),
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        ckdir = wd / "checkpoints"
        deadline = time.time() + 300
        try:
            while time.time() < deadline:
                if ckdir.exists() and any(
                    e for e in ckdir.iterdir() if e.name != "_quarantine"
                ):
                    break
                time.sleep(0.2)
            else:
                pytest.fail("trainer produced no checkpoint activity")
            os.kill(p.pid, signal.SIGKILL)
        finally:
            p.wait()
        # phase 2: resume on the same workdir must recover whatever the
        # kill left (stale tmp or clean dir) and finish durably past the
        # interrupted run's horizon
        out = subprocess.run(
            cmd("--resume", **{"train.total_steps": 60,
                               "train.ckpt_every": 5}),
            env=env, capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        ck = Checkpointer(ckdir)
        assert ck.latest_step() == 60
        ck.close()
