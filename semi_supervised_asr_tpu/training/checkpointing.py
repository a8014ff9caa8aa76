"""Checkpoint / resume via orbax (SURVEY.md §6, §3 #19).

Reference contract: ``torch.save({model,opt,step})`` + ``--load`` resume +
best-metric checkpoint retention.  TPU-grade realization: orbax
CheckpointManager with async-capable sharded saves, an atomic latest-step
pointer, bounded retention, and a separate best-metric checkpoint.
The saved tree is the full TrainState (params, opt state, EMA params,
step, PRNG key) plus the data-iterator position (epoch, batch-in-epoch).
Resume continues the EXACT stream: the solver fast-forwards the labeled
epoch plan past the recorded batch index and each unlabeled stream by
the restored step count (plan cost only — skipped batches are never
assembled), so the resumed parameter trajectory is bitwise-equal to an
uninterrupted run (tests/test_exact_resume.py).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from semi_supervised_asr_tpu.training.train_step import TrainState

_log = logging.getLogger("semi_supervised_asr_tpu.ckpt")


class CheckpointNotDurable(RuntimeError):
    """A save that was requested (and drained) never became the latest
    finalized checkpoint.  Raised instead of silently continuing: the
    round-3 soak livelocked for hours because an exec-restart trusted a
    save that never finalized and re-ran the same 900 steps forever."""


def _quarantine_stale_tmp(directory: Path) -> list[str]:
    """Move stale ``*.orbax-checkpoint-tmp*`` dirs out of the way.

    A save that died mid-flight (crash, kill, or two processes racing on
    one workdir) leaves a tmp dir that permanently poisons every future
    save of that step — orbax keeps re-creating it and the step never
    finalizes.  MUST only run while the caller holds the workdir lock
    (advisor r4 medium): under the lock no OTHER trainer's save can be
    in flight either, so any tmp entry is garbage by construction.
    Unlocked callers (decode/test-mode Solvers, soak_diagnose against a
    live soak) must NOT quarantine — they would rename the live
    trainer's in-flight save.  Entries are quarantined under
    ``_quarantine/`` (kept, not deleted, for post-mortem)."""
    moved = []
    if not directory.exists():
        return moved
    for entry in directory.iterdir():
        if ".orbax-checkpoint-tmp" in entry.name:
            qdir = directory / "_quarantine"
            qdir.mkdir(exist_ok=True)
            dest = qdir / f"{entry.name}.{int(time.time() * 1e3)}"
            try:
                entry.rename(dest)
            except OSError:
                continue   # another host's Checkpointer won the race
            moved.append(entry.name)
            _log.error(
                "quarantined stale checkpoint tmp dir %s -> %s "
                "(a previous save died mid-flight)", entry.name, dest,
            )
    return moved


class Checkpointer:
    def __init__(
        self,
        directory: str | Path,
        max_to_keep: int = 3,
        best_metric: str | None = None,
        best_mode: str = "min",
        async_save: bool = False,
    ):
        """``async_save`` (train.async_ckpt): orbax persists in a
        background thread so training steps keep pipelining during the
        write; save() then returns immediately and restore/close drain
        in-flight saves first."""
        self.dir = Path(directory).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        # stale-tmp recovery is NOT automatic here (advisor r4 medium):
        # __init__ runs for read-only Solvers too (decode/--test,
        # soak_diagnose pointed at a LIVE soak workdir), and renaming an
        # actively-training process's in-flight *.orbax-checkpoint-tmp
        # would fail ITS healthy save.  Writers call
        # quarantine_stale_tmp() explicitly, under the workdir lock.
        self.quarantined: list[str] = []
        self.async_save = async_save
        # THE r3 LIVELOCK ROOT CAUSE: orbax's best-metric retention
        # (BestN) alone deletes the JUST-SAVED checkpoint whenever its
        # metric is worse than all retained ones — after the soak's dev
        # collapse every new save scored worse than the three healthy
        # checkpoints, was garbage-collected on arrival, latest_step()
        # froze at 4500, and exec-restart re-ran the same 900 steps
        # forever.  Resume needs the LATEST step unconditionally, so the
        # policy is LatestN(2) ∪ BestN(max_to_keep): the newest two
        # checkpoints are always preserved (two, so the anchor survives
        # even while its successor is mid-save), best-N on top for
        # decode-time best/averaged restores.
        preservation = None
        if best_metric:
            # public path (advisor r4 low: orbax 0.11 exposes the
            # preservation policies at checkpoint_managers; the _src
            # path can break on any upgrade)
            from orbax.checkpoint import checkpoint_managers as _pp

            preservation = _pp.AnyPreservationPolicy([
                _pp.LatestN(n=2),
                _pp.BestN(
                    get_metric_fn=lambda m: m[best_metric],
                    reverse=(best_mode == "min"),
                    n=max_to_keep,
                    keep_checkpoints_without_metrics=True,
                ),
            ])
        options = ocp.CheckpointManagerOptions(
            # max_to_keep is mutually exclusive with preservation_policy
            # (the policy's BestN(n=max_to_keep) carries the same bound);
            # best_fn/best_mode stay — best_step() ranks with them
            max_to_keep=None if preservation else max_to_keep,
            best_fn=(lambda m: m[best_metric]) if best_metric else None,
            best_mode=best_mode,
            preservation_policy=preservation,
            enable_async_checkpointing=async_save,
        )
        self.mgr = ocp.CheckpointManager(self.dir, options=options)

    def quarantine_stale_tmp(self) -> list[str]:
        """Quarantine dead-save debris.  Call ONLY while holding the
        workdir lock (Solver.train does, right after acquiring it) —
        see :func:`_quarantine_stale_tmp` for why unlocked callers must
        not.  Idempotent; accumulates into ``self.quarantined``."""
        moved = _quarantine_stale_tmp(self.dir)
        self.quarantined.extend(moved)
        return moved

    def save(
        self,
        step: int,
        state: TrainState,
        data_pos: dict | None = None,
        metrics: dict | None = None,
    ) -> None:
        tree = {
            "state": state._asdict(),
            "data_pos": data_pos or {"epoch": 0, "batch": 0},
        }
        if self.async_save:
            # surface a PREVIOUS async save's failure now instead of
            # letting it vanish (round-3 soak: a save that never
            # finalized produced an hours-long silent livelock)
            self.mgr.check_for_errors()
        self.mgr.save(
            step,
            args=ocp.args.StandardSave(tree),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        if not self.async_save:
            self.mgr.wait_until_finished()
            self.verify_durable(step)

    def verify_durable(self, step: int) -> None:
        """Drain in-flight saves, then PROVE ``step`` is the latest
        finalized checkpoint — raise :class:`CheckpointNotDurable`
        otherwise.  Called before anything that treats the save as done
        (exec-restart, end-of-training): ``wait_until_finished()``
        returning is NOT durability — the r3 soak produced saves that
        drained cleanly yet never finalized (stale tmp dir from a racing
        writer), and trusting them cost every step since the last real
        checkpoint, forever."""
        self.mgr.wait_until_finished()
        self.mgr.check_for_errors()
        latest = self.mgr.latest_step()
        if latest != step:
            stale = [e.name for e in self.dir.iterdir()
                     if ".orbax-checkpoint-tmp" in e.name]
            raise CheckpointNotDurable(
                f"checkpoint save of step {step} did not finalize: "
                f"latest durable step is {latest}, retained steps "
                f"{self.all_steps()}"
                + (f", stale tmp dirs {stale}" if stale else "")
                + " — refusing to continue as if the save succeeded "
                "(is another trainer racing on this workdir?)"
            )

    def latest_step(self) -> int | None:
        return self.mgr.latest_step()

    def best_step(self) -> int | None:
        return self.mgr.best_step()

    def restore(
        self, state_template: TrainState, step: int | None = None
    ) -> tuple[TrainState, dict, int]:
        """-> (state, data_pos, step). Template supplies shapes/dtypes."""
        self.mgr.wait_until_finished()    # drain in-flight async saves
        if step is None:
            step = self.latest_step()
        assert step is not None, f"no checkpoint found in {self.dir}"
        template = {
            "state": state_template._asdict(),
            "data_pos": {"epoch": 0, "batch": 0},
        }
        tree = self.mgr.restore(step, args=ocp.args.StandardRestore(template))
        state = TrainState(**tree["state"])
        return state, tree["data_pos"], int(step)

    def all_steps(self) -> list[int]:
        return sorted(self.mgr.all_steps())

    def average_params(
        self, state_template: TrainState, last_k: int
    ) -> tuple[dict, list[int]]:
        """Elementwise mean of the params of the last ``last_k`` retained
        checkpoints (standard seq2seq-ASR decode trick; reduces variance of
        the final iterate).  -> (averaged params, steps used)."""
        steps = self.all_steps()[-max(int(last_k), 1):]
        assert steps, f"no checkpoints found in {self.dir}"
        acc = None
        for s in steps:
            state, _, _ = self.restore(state_template, s)
            p = jax.tree.map(
                lambda x: np.asarray(x, np.float64), state.params
            )
            acc = p if acc is None else jax.tree.map(np.add, acc, p)
        inv = 1.0 / len(steps)
        tmpl = state_template.params
        avg = jax.tree.map(
            lambda a, t: np.asarray(a * inv, np.asarray(t).dtype), acc, tmpl
        )
        return avg, steps

    def close(self) -> None:
        self.mgr.wait_until_finished()
        self.mgr.close()
