"""Serving export (export.py): a baked StableHLO decode artifact must
reproduce the live decode exactly, with no model code at load time."""

import json
import subprocess
import sys

import jax
import numpy as np
import pytest

from semi_supervised_asr_tpu.config import load_config
from semi_supervised_asr_tpu.training.solver import Solver

CONFIG = "configs/synthetic_smoke.yaml"


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    wd = tmp_path_factory.mktemp("exp_train")
    cfg = load_config(CONFIG, [
        "data.num_synthetic_utts=8", "train.batch_size=4",
        "train.total_steps=4", "train.eval_every=0", "train.ckpt_every=4",
        "train.log_every=2",
    ])
    solver = Solver(cfg, wd, use_mesh=False)
    solver.train()
    return solver, wd


class TestExportRoundTrip:
    def test_artifact_matches_live_decode(self, trained, tmp_path):
        from semi_supervised_asr_tpu import export as EX

        solver, _ = trained
        params = dict(solver.state.params)
        params["__cmvn_mean"], params["__cmvn_std"] = solver.cmvn
        frames, batch = 96, 4
        blob = EX.export_decode(solver.cfg, dict(params), batch, frames,
                                mode="beam")
        path = tmp_path / "a.shlo"
        path.write_bytes(blob)

        s = (frames - 1) * solver.cfg.frontend.hop_length
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal((batch, s)) * 0.1).astype(np.float32)
        lens = np.full((batch,), s, np.int32)

        live = EX.build_decode_fn(solver.cfg, dict(params), "beam")
        want_toks, want_scores = jax.jit(live)(audio, lens)
        got_toks, got_scores = EX.run_artifact(path, audio, lens)
        np.testing.assert_array_equal(np.asarray(got_toks),
                                      np.asarray(want_toks))
        np.testing.assert_allclose(np.asarray(got_scores),
                                   np.asarray(want_scores), rtol=1e-5)

    def test_bf16_quantized_artifact(self, trained, tmp_path):
        import jax.numpy as jnp

        from semi_supervised_asr_tpu import export as EX

        solver, _ = trained
        params = dict(solver.state.params)
        params["__cmvn_mean"], params["__cmvn_std"] = solver.cmvn
        frames, batch = 96, 4
        f32 = EX.export_decode(solver.cfg, dict(params), batch, frames,
                               mode="greedy")
        bf16 = EX.export_decode(solver.cfg, dict(params), batch, frames,
                                mode="greedy", param_dtype=jnp.bfloat16)
        # weights dominate the artifact: bf16 must be materially smaller
        assert len(bf16) < 0.75 * len(f32), (len(bf16), len(f32))

        p = tmp_path / "q.shlo"
        p.write_bytes(bf16)
        s = (frames - 1) * solver.cfg.frontend.hop_length
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal((batch, s)) * 0.1).astype(np.float32)
        lens = np.full((batch,), s, np.int32)
        toks, scores = EX.run_artifact(p, audio, lens)
        assert np.asarray(toks).shape[0] == batch
        assert np.all(np.isfinite(np.asarray(scores)))

    def test_cli_writes_manifest_and_artifacts(self, trained, tmp_path):
        _, wd = trained
        out = subprocess.run(
            [sys.executable, "-m", "semi_supervised_asr_tpu.export",
             "--config", CONFIG, "--load-dir", str(wd),
             "--out", str(tmp_path / "exp"), "--batch", "2",
             "--frames", "96", "--greedy", "--platform", "cpu",
             "data.num_synthetic_utts=8"],
            capture_output=True, text=True, timeout=560,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        man = json.loads((tmp_path / "exp" / "manifest.json").read_text())
        assert len(man["artifacts"]) == 1
        art = man["artifacts"][0]
        assert (tmp_path / "exp" / art["file"]).stat().st_size == art["bytes"]
        assert (tmp_path / "exp" / "vocab.json").exists()

        # the artifact decodes real audio with only jax at hand
        from semi_supervised_asr_tpu.export import run_artifact

        rng = np.random.default_rng(1)
        audio = (rng.standard_normal((2, art["samples"])) * 0.1).astype(
            np.float32)
        lens = np.full((2,), art["samples"], np.int32)
        toks, scores = run_artifact(tmp_path / "exp" / art["file"],
                                    audio, lens)
        assert np.asarray(toks).shape[0] == 2
