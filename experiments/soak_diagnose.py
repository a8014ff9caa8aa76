"""Diagnose the r3 soak's step-5000 dev-WER collapse (VERDICT r3 #2).

Observed: dev WER 0.108 @4000/4500-era -> 1.061 @5000 while teacher-forced
train loss/acc stayed healthy (1.49/0.82) — free-running greedy decode
emitting garbage at >100% WER is the signature of decoder/free-running
divergence (exposure bias or pseudo-label feedback), not an acoustic
regression.  Also suspicious: dev WER bitwise-identical at evals
2000/3000/4000.

This driver answers both with the RETAINED checkpoints (and any finer
ones a re-run of the 4500->5200 segment leaves behind):

for each retained step:
  * greedy-decode the dev set with the LIVE params -> CER/WER,
    hypothesis-length statistics (insertion runaway shows up as
    hyp_len/ref_len >> 1), and a few sample hyp/ref pairs;
  * the same with the EMA (teacher) params — the pseudo-label loop
    trains the student toward THESE free-running outputs, so their
    health is the feedback loop's health;
  * greedy-decode a small slice of the UNLABELED audio with the EMA
    teacher: these are literally the pseudo-labels the student saw.

Usage:
  python -m experiments.soak_diagnose --workdir /tmp/soak_run \
      --config configs/ls100_semi.yaml --out /tmp/soak_diag.json \
      -- data.data_dir=/tmp/soak_ls/man ...   (same overrides as the run)
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _hyp_stats(records):
    hl = np.asarray([len(r["hyp"]) for r in records], np.float64)
    rl = np.asarray([max(len(r["ref"]), 1) for r in records], np.float64)
    ratio = hl / rl
    return {
        "n": len(records),
        "hyp_chars_mean": float(hl.mean()),
        "ref_chars_mean": float(rl.mean()),
        "len_ratio_mean": float(ratio.mean()),
        "len_ratio_p90": float(np.percentile(ratio, 90)),
        "maxlen_frac": float((hl >= hl.max() - 1).mean()) if len(hl) else 0,
    }


def _samples(records, k=4):
    return [{"uid": r["uid"], "ref": r["ref"][:160], "hyp": r["hyp"][:160]}
            for r in records[:k]]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--steps", default="",
                   help="comma-separated subset of checkpoint steps "
                        "(default: all retained)")
    p.add_argument("--unlabeled-batches", type=int, default=2,
                   help="unlabeled-audio batches to pseudo-label with the "
                        "EMA teacher per checkpoint")
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args()

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.training.solver import Solver

    cfg = load_config(args.config, args.overrides)
    solver = Solver(cfg, args.workdir)

    steps = solver.ckpt.all_steps()
    if args.steps:
        want = {int(s) for s in args.steps.split(",")}
        steps = [s for s in steps if s in want]
    print(f"# diagnosing checkpoints {steps}")

    report = {"workdir": args.workdir, "checkpoints": []}
    for s in steps:
        state, _, _ = solver.ckpt.restore(solver.state, s)
        entry = {"step": int(s)}
        for tag, params in (("live", state.params),
                            ("ema", state.ema_params)):
            rate, records, wrate = solver._score_batches(
                solver.bundle.dev, params, "greedy"
            )
            entry[tag] = {
                "dev_cer": rate, "dev_wer": wrate,
                **_hyp_stats(records),
                "samples": _samples(records),
            }
            if tag == "live":
                entry["_all_hyps"] = [r["hyp"] for r in records]
            print(f"# step {s} {tag}: cer={rate:.4f} wer={wrate:.4f} "
                  f"len_ratio={entry[tag]['len_ratio_mean']:.2f}")
        # the pseudo-labels the student actually consumed: greedy decode
        # of unlabeled audio with the EMA teacher
        if solver.bundle.unlabeled_audio is not None:
            _, urecs, _ = solver._score_batches(
                solver.bundle.unlabeled_audio, state.ema_params,
                "greedy", max_batches=args.unlabeled_batches,
            )
            entry["pseudo_labels"] = {
                **_hyp_stats(urecs),
                "samples": _samples(urecs),
            }
            print(f"# step {s} pseudo: len_ratio="
                  f"{entry['pseudo_labels']['len_ratio_mean']:.2f}")
        report["checkpoints"].append(entry)

    # stasis check (the bitwise-identical dev WER at evals 2000/3000/4000):
    # are consecutive checkpoints' FULL dev hypothesis lists identical?
    hyp_lists = [e.pop("_all_hyps") for e in report["checkpoints"]]
    report["consecutive_identical_hyps"] = [
        {"steps": [report["checkpoints"][i]["step"],
                   report["checkpoints"][i + 1]["step"]],
         "identical": hyp_lists[i] == hyp_lists[i + 1],
         "n_differing": sum(a != b for a, b in
                            zip(hyp_lists[i], hyp_lists[i + 1]))}
        for i in range(len(hyp_lists) - 1)
    ]

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
