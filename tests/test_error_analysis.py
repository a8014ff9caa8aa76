"""Error analysis (utils/error_analysis.py): alignment backtrace,
S/I/D accounting, the 61->39 scoring fold, worst-utterance ranking, the
standalone CLI, and the Solver.test hook that writes
<hyp-out>.analysis.json.
"""

import json
import subprocess
import sys
from pathlib import Path

import pytest

from semi_supervised_asr_tpu.utils import error_analysis as EA

quick = pytest.mark.quick


@quick
class TestAlign:
    def test_exact_ops(self):
        ref = ["a", "b", "c", "d"]
        hyp = ["a", "x", "d"]          # one sub + one del (tie on which)
        ops = EA.align(ref, hyp)
        # deterministic backtrace: the sub binds to the LATER ref token
        assert ops == [("eq", "a", "a"), ("del", "b", None),
                       ("sub", "c", "x"), ("eq", "d", "d")]
        # and repeated calls agree
        assert ops == EA.align(ref, hyp)

    def test_insertion(self):
        ops = EA.align(["a", "b"], ["a", "z", "b"])
        assert ("ins", None, "z") in ops
        assert sum(1 for o in ops if o[0] == "eq") == 2

    def test_empty_sides(self):
        assert EA.align([], ["a", "b"]) == [("ins", None, "a"),
                                            ("ins", None, "b")]
        assert EA.align(["a"], []) == [("del", "a", None)]
        assert EA.align([], []) == []

    def test_distance_matches_ops(self):
        import numpy as np

        rng = np.random.default_rng(0)
        for _ in range(25):
            ref = [str(x) for x in rng.integers(0, 5, rng.integers(0, 12))]
            hyp = [str(x) for x in rng.integers(0, 5, rng.integers(0, 12))]
            ops = EA.align(ref, hyp)
            errs = sum(1 for o in ops if o[0] != "eq")
            # reference Levenshtein
            n, m = len(ref), len(hyp)
            dp = np.zeros((n + 1, m + 1), int)
            dp[:, 0] = np.arange(n + 1)
            dp[0, :] = np.arange(m + 1)
            for i in range(1, n + 1):
                for j in range(1, m + 1):
                    dp[i, j] = min(
                        dp[i - 1, j - 1] + (ref[i - 1] != hyp[j - 1]),
                        dp[i - 1, j] + 1, dp[i, j - 1] + 1,
                    )
            assert errs == dp[n, m]
            # alignment reconstructs both sequences
            assert [r for op, r, _ in ops if op != "ins"] == ref
            assert [h for op, _, h in ops if op != "del"] == hyp


@quick
class TestAnalyze:
    def test_counts_and_rates(self):
        pairs = [(["a", "b", "c"], ["a", "x", "c"]),   # 1 sub / 3
                 (["a", "b"], ["a", "b", "y"])]        # 1 ins / 2
        a = EA.analyze_pairs(pairs)
        assert a["ref_tokens"] == 5
        assert (a["sub"], a["del"], a["ins"], a["eq"]) == (1, 0, 1, 4)
        assert a["error_rate"] == round(2 / 5, 4)
        assert a["top_confusions"][0] == {"ref": "b", "hyp": "x", "count": 1}
        assert a["top_insertions"][0] == {"token": "y", "count": 1}

    def test_phone_fold_matches_scoring(self):
        """'q' deletes, 'ux'=='uw' after the fold — alignment runs on the
        SAME units the PER counts."""
        from semi_supervised_asr_tpu.data.vocab import timit_vocab

        vocab = timit_vocab()
        records = [{"uid": "u0", "ref": "q ux ae", "hyp": "uw ae",
                    "errors": 0, "ref_len": 2}]
        a = EA.analyze_records(records, vocab, "phone")
        assert a["unit"] == "phone39"
        assert a["error_rate"] == 0.0
        assert a["ref_tokens"] == 2        # q deleted, ux->uw

    def test_worst_utts_ranked(self):
        records = [
            {"uid": "good", "ref": "a b", "hyp": "a b",
             "errors": 0, "ref_len": 2},
            {"uid": "bad", "ref": "a b", "hyp": "x y",
             "errors": 2, "ref_len": 2},
        ]
        a = EA.analyze_records(records, None, "char", worst=1)
        assert a["worst_utts"][0]["uid"] == "bad"

    def test_cli_roundtrip(self, tmp_path):
        hyps = tmp_path / "hyps.jsonl"
        hyps.write_text(json.dumps(
            {"uid": "u", "ref": "the cat", "hyp": "the hat",
             "errors": 1, "ref_len": 7}
        ) + "\n")
        r = subprocess.run(
            [sys.executable, "-m",
             "semi_supervised_asr_tpu.utils.error_analysis", str(hyps)],
            capture_output=True, text=True,
            cwd=Path(__file__).resolve().parent.parent, timeout=120,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip())
        assert out["sub"] == 1 and out["error_rate"] == 0.5
        report = json.loads(Path(out["out"]).read_text())
        assert report["top_confusions"][0]["ref"] == "cat"


class TestSolverHook:
    def test_analysis_written_next_to_hyps(self, tmp_path):
        import jax

        from semi_supervised_asr_tpu.config import load_config
        from semi_supervised_asr_tpu.training.solver import Solver

        cfg = load_config("configs/synthetic_smoke.yaml", [
            "data.num_synthetic_utts=8", "train.batch_size=8",
            "train.total_steps=4", "train.eval_every=0",
            "train.ckpt_every=4", "train.log_every=2",
            "model.enc_hidden=8", "model.enc_layers=2",
            "data.frame_buckets=[128]", "data.token_buckets=[16]",
        ])
        solver = Solver(cfg, tmp_path, use_mesh=False)
        solver.train()
        out = solver.test(
            mode="greedy", out_path=tmp_path / "hyps.jsonl"
        )
        assert "per" in out
        report = json.loads(
            (tmp_path / "hyps.jsonl.analysis.json").read_text()
        )
        assert report["unit"] == "phone39"
        # --test with no data.test_split scores DEV: the synthetic
        # bundle's dev split is max(n_utts // 4, 4) = 4 utterances
        assert report["n_utts"] == 4
        assert report["ref_tokens"] > 0
        assert (report["sub"] + report["del"] + report["ins"]
                + report["eq"]) >= report["ref_tokens"] - report["ins"]
