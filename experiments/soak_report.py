"""Assemble experiments/soak_report.json from a completed soak workdir.

The r3 soak section promised "Numbers (filled at end of run): see
soak_report.json" and the file never existed because the run livelocked
(VERDICT r3 missing #1).  This builder makes the report a one-command
artifact of the workdir + watchdog logs, so a completed run cannot ship
without its numbers again:

* step/loss/WER trajectory (train records deduped by first occurrence —
  a racing-writer era like r3's would otherwise interleave duplicates);
* data-coverage record (skip counts — VERDICT r3 weak #8);
* restart accounting: exec-restart boundaries, watchdog generations,
  resume points;
* throughput: frames_per_sec summary over the steady-state records;
* final test/decode results merged in from the --test / transcribe /
  export phases (passed via --test-json etc.).

Usage:
  python experiments/soak_report.py --workdir /tmp/soak_run4 \
      --watchdog-log /tmp/soak4_watchdog.log \
      --gen-logs '/tmp/soak4_wd_gen*.log' \
      [--test-json '...'] [--extra k=v ...] \
      --out experiments/soak_report.json
"""

from __future__ import annotations

import argparse
import glob
import json
import re
from pathlib import Path

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", required=True)
    p.add_argument("--watchdog-log", default=None)
    p.add_argument("--gen-logs", default=None, help="glob of generation logs")
    p.add_argument("--test-json", default=None,
                   help="JSON string or @file with the --test phase result")
    p.add_argument("--out", required=True)
    p.add_argument("--extra", nargs="*", default=[],
                   help="key=json-value extras merged into the report")
    args = p.parse_args()

    wd = Path(args.workdir)
    train, dev, data_cov, wall = {}, [], None, []
    for line in open(wd / "metrics.jsonl"):
        r = json.loads(line)
        if r.get("prefix") == "train":
            train.setdefault(r["step"], r)     # first writer wins
        elif r.get("prefix") == "dev":
            dev.append(r)
        elif r.get("prefix") == "data":
            data_cov = r
        elif r.get("prefix") == "wall":
            wall.append(r)

    steps = sorted(train)
    fps = [train[s]["frames_per_sec"] for s in steps[3:]]  # skip warm-up
    dev_seen = {}
    for r in dev:
        dev_seen.setdefault(r["step"], r)
    traj = [
        {"step": s, "dev_error": round(r["dev_error"], 5),
         **({"dev_wer": round(r["dev_wer"], 5)} if "dev_wer" in r else {})}
        for s, r in sorted(dev_seen.items())
    ]

    report = {
        "workdir": str(wd),
        "steps_completed": steps[-1] if steps else 0,
        "train_loss_first_last": [
            round(train[steps[0]]["loss"], 4),
            round(train[steps[-1]]["loss"], 4),
        ] if steps else None,
        "train_acc_last": round(train[steps[-1]].get("acc", float("nan")), 4)
        if steps else None,
        "dev_trajectory": traj,
        "data_coverage": data_cov,
        "frames_per_sec": {
            "median": round(float(np.median(fps)), 1) if fps else None,
            "p10": round(float(np.percentile(fps, 10)), 1) if fps else None,
            "p90": round(float(np.percentile(fps, 90)), 1) if fps else None,
        },
        "duplicate_train_steps": sum(
            1 for line in open(wd / "metrics.jsonl")
            if '"prefix": "train"' in line
        ) - len(steps),   # >0 would mean two writers raced (r3 weak #2)
    }

    # restart/eval window attribution (VERDICT r4 next #7): where the
    # p10-vs-median throughput gap actually goes, from the solver's
    # "wall" records (startup + first-step per process generation) and
    # the per-eval walls in the dev records
    def _sum(key, recs):
        vals = [r[key] for r in recs if key in r]
        return {"n": len(vals), "total_s": round(sum(vals), 1),
                "median_s": round(float(np.median(vals)), 2)} \
            if vals else None
    report["overhead_windows"] = {
        "startup": _sum("startup_wall_s", wall),
        "first_step": _sum("first_step_wall_s", wall),
        "restart_boundary_save": _sum("restart_save_wall_s", wall),
        "eval_decode": _sum("eval_wall_s", dev),
        "eval_ckpt_save": _sum("ckpt_wall_s", dev),
    }

    gens = []
    if args.gen_logs:
        for lg in sorted(glob.glob(args.gen_logs)):
            txt = open(lg, errors="replace").read()
            gens.append({
                "log": lg,
                "resumes": re.findall(r"resumed from step (\d+)", txt),
                "exec_restarts": len(
                    re.findall(r"exec-restart boundary at step (\d+)", txt)
                ),
                "completed": '"final_dev"' in txt,
            })
    report["generations"] = gens
    if args.watchdog_log and Path(args.watchdog_log).exists():
        report["watchdog"] = [
            l.strip() for l in open(args.watchdog_log, errors="replace")
            if l.startswith("watchdog:")
        ]
    if args.test_json:
        tj = args.test_json
        if tj.startswith("@"):
            tj = open(tj[1:]).read()
        report["test"] = json.loads(tj)
    for kv in args.extra:
        k, v = kv.split("=", 1)
        try:
            report[k] = json.loads(v)
        except json.JSONDecodeError:
            report[k] = v

    Path(args.out).write_text(json.dumps(report, indent=1) + "\n")
    print(f"wrote {args.out}: steps={report['steps_completed']} "
          f"dev_points={len(traj)} gens={len(gens)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
