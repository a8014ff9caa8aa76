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

from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from semi_supervised_asr_tpu.training.train_step import TrainState


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
        self.async_save = async_save
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m[best_metric]) if best_metric else None,
            best_mode=best_mode,
            enable_async_checkpointing=async_save,
        )
        self.mgr = ocp.CheckpointManager(self.dir, options=options)

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
        self.mgr.save(
            step,
            args=ocp.args.StandardSave(tree),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )
        if not self.async_save:
            self.mgr.wait_until_finished()

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
