"""Integration gates (SURVEY.md §5.2-2):
* C1 overfit: synthetic corpus to ~0 PER within N steps;
* checkpoint -> resume: bitwise-equal params;
* CLI train/test entrypoints end-to-end.
These are the slowest tests in the suite (~minutes on CPU)."""

import json
import subprocess
import sys

import jax
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import load_config
from semi_supervised_asr_tpu.training.solver import Solver

CONFIG = "configs/synthetic_smoke.yaml"


def small_cfg(**overrides):
    ovs = [f"{k}={v}" for k, v in overrides.items()]
    return load_config(CONFIG, ovs)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One shared short training run (16 utts, 200 steps)."""
    wd = tmp_path_factory.mktemp("overfit")
    cfg = small_cfg(**{
        "data.num_synthetic_utts": 16,
        "train.batch_size": 8,
        "train.learning_rate": 0.003,
        "train.total_steps": 200,
        "train.eval_every": 200,
        "train.ckpt_every": 100,
        "train.log_every": 50,
    })
    solver = Solver(cfg, wd, use_mesh=False)
    solver.train()
    return solver, wd


class TestOverfitGate:
    def test_c1_overfit_to_near_zero_per(self, trained):
        solver, _ = trained
        rate, _, _ = solver._score_batches(
            solver.bundle.train, solver.state.params, "greedy"
        )
        assert rate < 0.1, f"train PER {rate} after overfit run"

    def test_beam_also_near_zero(self, trained):
        solver, _ = trained
        rate, _, _ = solver._score_batches(
            solver.bundle.train, solver.state.params, "beam"
        )
        assert rate < 0.1


class TestCheckpointResume:
    def test_restore_bitwise_equal(self, trained):
        solver, _ = trained
        template = solver.state
        restored, data_pos, step = solver.ckpt.restore(template)
        assert step == 200
        for a, b in zip(
            jax.tree.leaves(restored.params), jax.tree.leaves(template.params)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state restored too
        for a, b in zip(
            jax.tree.leaves(restored.opt_state),
            jax.tree.leaves(template.opt_state),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_best_step_tracked(self, trained):
        solver, _ = trained
        assert solver.ckpt.latest_step() == 200
        assert solver.ckpt.best_step() is not None

    def test_checkpoint_averaging(self, trained):
        """average_params == elementwise mean of the retained checkpoints,
        and decode runs with the averaged params (decode.average_ckpts)."""
        solver, wd = trained
        steps = solver.ckpt.all_steps()
        assert len(steps) >= 2
        avg, used = solver.ckpt.average_params(solver.state, 2)
        assert used == steps[-2:]
        p1, _, _ = solver.ckpt.restore(solver.state, used[0])
        p2, _, _ = solver.ckpt.restore(solver.state, used[1])
        leaf = lambda p: np.asarray(  # noqa: E731
            jax.tree.leaves(p.params)[0], np.float64)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(avg)[0], np.float64),
            (leaf(p1) + leaf(p2)) / 2, rtol=1e-6, atol=1e-7)
        # decode path end-to-end with averaging enabled
        import dataclasses

        cfg = solver.cfg.replace(decode=dataclasses.replace(
            solver.cfg.decode, average_ckpts=2))
        s2 = Solver(cfg, wd, use_mesh=False)
        result = s2.test(mode="greedy")
        assert result["n_utts"] > 0


class TestSemiSupervisedSolver:
    def test_semi_train_end_to_end(self, tmp_path):
        """C4 shape: labeled + unlabeled audio + unlabeled text streams
        zipped through the Solver, all three loss terms logged."""
        cfg = small_cfg(**{
            "data.num_synthetic_utts": 16,
            "train.batch_size": 4,
            "train.total_steps": 6,
            "train.eval_every": 6,
            "train.ckpt_every": 6,
            "train.log_every": 2,
            "objective.lambda_text_ae": 0.3,
            "objective.lambda_pseudo": 0.3,
            "objective.use_ema_teacher": "true",
        })
        solver = Solver(cfg, tmp_path, use_mesh=False)
        assert solver.semi
        result = solver.train()
        assert "dev_error" in result
        import json

        recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")
                if '"prefix": "train"' in l]
        assert recs, "no train records logged"
        for key in ("ce", "text_ae", "pseudo", "loss"):
            assert key in recs[-1], f"missing {key} in {recs[-1]}"
            assert np.isfinite(recs[-1][key])


class TestCkptEveryZero:
    def test_periodic_saves_disabled_still_saves_final(self, tmp_path):
        """train.ckpt_every=0 disables periodic saves but the end-of-run
        save must still land (was: ZeroDivisionError at the final-save
        modulo — found by the r3 recipe-scale soak probe)."""
        cfg = small_cfg(**{
            "data.num_synthetic_utts": 8,
            "train.batch_size": 4,
            "train.total_steps": 4,
            "train.eval_every": 0,
            "train.ckpt_every": 0,
            "train.log_every": 2,
        })
        solver = Solver(cfg, tmp_path, use_mesh=False)
        result = solver.train()
        assert "dev_error" in result
        steps = [int(p.name) for p in (tmp_path / "checkpoints").iterdir()
                 if p.name.isdigit()]
        assert steps == [4], steps


class TestWERReporting:
    def test_char_unit_reports_wer(self, tmp_path):
        """LibriSpeech's headline metric is word-level WER (SURVEY §1.1 #7):
        char-unit scoring must surface it alongside CER."""
        cfg = small_cfg(**{
            "data.unit": "char",
            "data.num_synthetic_utts": 8,
            "train.batch_size": 4,
        })
        solver = Solver(cfg, tmp_path, use_mesh=False)
        rate, records, wrate = solver._score_batches(
            solver.bundle.dev, solver.state.params, "greedy"
        )
        assert wrate is not None and wrate >= 0.0
        assert {"word_errors", "ref_words"} <= set(records[0])
        result = solver.test(mode="greedy", restore_best=False)
        assert "cer" in result and "wer" in result


class TestCLI:
    def test_test_entrypoint_on_saved_ckpt(self, trained):
        _, wd = trained
        out = subprocess.run(
            [sys.executable, "-m", "semi_supervised_asr_tpu.main",
             "--config", CONFIG, "--test", "--load-dir", str(wd),
             "--platform", "cpu", "--beam", "1",
             "--hyp-out", str(wd / "hyps.jsonl"),
             "data.num_synthetic_utts=16"],
            capture_output=True, text=True, timeout=560,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        result = json.loads(out.stdout.strip().splitlines()[-1])
        assert "per" in result and result["n_utts"] > 0
        hyps = [json.loads(l) for l in open(wd / "hyps.jsonl")]
        assert len(hyps) == result["n_utts"]
        assert {"uid", "ref", "hyp", "errors", "ref_len"} <= set(hyps[0])

    def test_train_entrypoint_tiny(self, tmp_path):
        out = subprocess.run(
            [sys.executable, "-m", "semi_supervised_asr_tpu.main",
             "--config", CONFIG, "--train", "--workdir", str(tmp_path),
             "--platform", "cpu",
             "train.total_steps=3", "train.eval_every=0",
             "train.ckpt_every=3", "train.log_every=1",
             "data.num_synthetic_utts=16", "train.batch_size=8"],
            capture_output=True, text=True, timeout=560,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert (tmp_path / "metrics.jsonl").exists()


class TestAsyncCheckpoint:
    def test_async_save_restores_identically(self, tmp_path):
        """train.async_ckpt: background saves drain before restore and
        produce bit-identical state."""
        cfg = small_cfg(**{
            "data.num_synthetic_utts": 8,
            "train.batch_size": 4,
            "train.total_steps": 4,
            "train.eval_every": 0,
            "train.ckpt_every": 2,
            "train.log_every": 2,
            "train.async_ckpt": "true",
        })
        solver = Solver(cfg, tmp_path, use_mesh=False)
        solver.train()
        assert solver.ckpt.latest_step() == 4
        restored, _, step = solver.ckpt.restore(solver.state)
        assert step == 4
        for a, b in zip(jax.tree.leaves(restored.params),
                        jax.tree.leaves(solver.state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEarlyStopping:
    def test_stops_when_dev_stalls(self, tmp_path):
        """lr=0 -> dev_error can never improve after the first eval;
        patience=1 must halt long before total_steps."""
        cfg = small_cfg(**{
            "data.num_synthetic_utts": 8,
            "train.batch_size": 4,
            "train.learning_rate": 0.0,
            "train.total_steps": 100,
            "train.eval_every": 2,
            "train.ckpt_every": 2,
            "train.log_every": 2,
            "train.early_stop_patience": 1,
        })
        solver = Solver(cfg, tmp_path, use_mesh=False)
        solver.train()
        assert int(solver.state.step) <= 6, int(solver.state.step)


class TestResume:
    def test_solver_resume_continues_from_checkpoint(self, tmp_path):
        base = {
            "data.num_synthetic_utts": 8,
            "train.batch_size": 4,
            "train.eval_every": 0,
            "train.ckpt_every": 2,
            "train.log_every": 2,
        }
        cfg4 = small_cfg(**base, **{"train.total_steps": 4})
        Solver(cfg4, tmp_path, use_mesh=False).train()

        cfg8 = small_cfg(**base, **{"train.total_steps": 8})
        s2 = Solver(cfg8, tmp_path, use_mesh=False)
        s2.train(resume=True)
        assert int(s2.state.step) == 8
        assert s2.ckpt.latest_step() == 8
        # resumed run logged steps 6 and 8 only (5..8 trained here)
        recs = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")
                if '"prefix": "train"' in l]
        assert [r["step"] for r in recs].count(6) == 1

    def test_cli_resume_flag(self, tmp_path):
        args = [sys.executable, "-m", "semi_supervised_asr_tpu.main",
                "--config", CONFIG, "--train", "--workdir", str(tmp_path),
                "--platform", "cpu", "train.eval_every=0",
                "train.ckpt_every=2", "train.log_every=2",
                "data.num_synthetic_utts=8", "train.batch_size=8"]
        out1 = subprocess.run(args + ["train.total_steps=2"],
                              capture_output=True, text=True, timeout=560)
        assert out1.returncode == 0, out1.stderr[-2000:]
        out2 = subprocess.run(args + ["train.total_steps=4", "--resume"],
                              capture_output=True, text=True, timeout=560)
        assert out2.returncode == 0, out2.stderr[-2000:]
        assert "resumed from step 2" in out2.stdout + out2.stderr


class TestCompileCache:
    @pytest.mark.quick
    def test_cache_dir_modes(self, tmp_path):
        """train.compile_cache_dir: "auto" -> <workdir>/jit_cache,
        explicit path honored, "" leaves jax config untouched — and a
        short train populates the cache (preemption/resume restarts
        then deserialize instead of recompiling every bucket cell)."""
        base = {
            "data.num_synthetic_utts": 4,
            "train.batch_size": 4,
            "train.total_steps": 2,
            "train.eval_every": 0,
            "train.ckpt_every": 0,
            "train.log_every": 2,
        }
        wd = tmp_path / "wd"
        s = Solver(small_cfg(**base), wd, use_mesh=False)
        assert jax.config.jax_compilation_cache_dir == \
            str(wd / "jit_cache")
        # two suite-order hazards, both now handled in the PRODUCT but
        # still forced here so this assertion is deterministic: (a) the
        # warmed in-process executable cache makes compiles sub-second,
        # falling under the persistence threshold -> clear + zero it;
        # (b) jax's persistent-cache singleton binds its dir at most
        # once per process -> Solver rebinds it when changing the dir
        # (the r3 flake: entries silently landed in an EARLIER test's
        # deleted tmp dir)
        jax.clear_caches()
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )
        s.train()
        assert any((wd / "jit_cache").iterdir()), (
            "compiled entries should persist"
        )

        explicit = tmp_path / "shared_cache"
        Solver(small_cfg(**base,
                         **{"train.compile_cache_dir": str(explicit)}),
               tmp_path / "wd2", use_mesh=False)
        assert jax.config.jax_compilation_cache_dir == str(explicit)

        # "" must not clobber whatever is already configured
        Solver(small_cfg(**base, **{"train.compile_cache_dir": '""'}),
               tmp_path / "wd3", use_mesh=False)
        assert jax.config.jax_compilation_cache_dir == str(explicit)

        # a new 'auto' solver re-points to ITS workdir (a previous
        # solver's update is not "external configuration")...
        wd4 = tmp_path / "wd4"
        Solver(small_cfg(**base), wd4, use_mesh=False)
        assert jax.config.jax_compilation_cache_dir == \
            str(wd4 / "jit_cache")

    def test_auto_respects_external_cache_dir(self, tmp_path, monkeypatch):
        """compile_cache_dir='auto' must NOT clobber a cache dir the
        caller configured before the first Solver (env
        JAX_COMPILATION_CACHE_DIR / jax.config) — only an explicit YAML
        path overrides it."""
        from semi_supervised_asr_tpu.training import solver as solver_mod

        ext = str(tmp_path / "external_cache")
        monkeypatch.setattr(solver_mod, "_EXTERNAL_COMPILE_CACHE", ext)
        prev = jax.config.jax_compilation_cache_dir
        try:
            jax.config.update("jax_compilation_cache_dir", ext)
            base = {
                "data.num_synthetic_utts": 4,
                "train.batch_size": 4,
                "train.total_steps": 2,
                "train.eval_every": 0,
                "train.ckpt_every": 0,
            }
            Solver(small_cfg(**base), tmp_path / "wd", use_mesh=False)
            assert jax.config.jax_compilation_cache_dir == ext
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)


class TestExecRestart:
    def test_exec_restart_completes_and_matches_continuous(self, tmp_path):
        """train.exec_restart_every: the process re-execs itself at
        segment boundaries (tunnel-leak mitigation) and the SEGMENTED
        run's loss trajectory is IDENTICAL to a continuous one (exact
        mid-epoch resume does the heavy lifting)."""
        base = ["--config", CONFIG, "--train", "--platform", "cpu",
                "train.total_steps=8", "train.eval_every=0",
                "train.ckpt_every=0", "train.log_every=1",
                "data.num_synthetic_utts=8", "train.batch_size=8"]

        def losses(wd, extra):
            out = subprocess.run(
                [sys.executable, "-m", "semi_supervised_asr_tpu.main",
                 "--workdir", str(wd), *base, *extra],
                capture_output=True, text=True, timeout=560,
            )
            assert out.returncode == 0, out.stderr[-2000:]
            recs = [json.loads(l) for l in open(wd / "metrics.jsonl")
                    if '"prefix": "train"' in l]
            return out.stdout + out.stderr, {
                r["step"]: r["loss"] for r in recs
            }

        log_seg, seg = losses(tmp_path / "seg",
                              ["train.exec_restart_every=3"])
        assert log_seg.count("exec-restart boundary") == 2
        assert "resumed from step 3" in log_seg
        assert "resumed from step 6" in log_seg
        _, cont = losses(tmp_path / "cont", [])
        assert set(seg) == set(cont) == set(range(1, 9))
        for s in cont:
            assert seg[s] == cont[s], (s, seg[s], cont[s])
