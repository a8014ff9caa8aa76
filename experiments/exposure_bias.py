"""LAS exposure-bias study: can scheduled sampling / MWER rescue
free-running decode at the scales where the collapse is observed?

Context (VERDICT r2 weak #4): at 512 structured-grammar utterances the
LAS decoder repeatedly failed to free-run in the r2 architecture
studies — teacher-forced accuracy ~0.8 while dev PER sat at 0.85-0.93 —
forcing those studies onto the CTC harness.  The parity family ships
scheduled sampling (`objective.tf_rate_start/end`) and MWER
(`objective.lambda_mwer`) as the textbook rescues, but no experiment
had measured either doing the rescuing.  This harness runs the
equal-budget arms that answer it:

* ``ctc_ref``   — same listener under CTC (the per-frame harness the
                  other studies fled to; the bar LAS must approach)
* ``tf10``      — pure teacher forcing (the collapse control)
* ``tf09/07/05``— scheduled sampling to 0.9 / 0.7 / 0.5 over the first
                  60% of training (linear, schedules.tf_rate_at)
* ``mwer``      — tf07's schedule + expected-risk fine-tuning for the
                  last 40% (lambda_mwer, in-step n-best risks)

Each arm reports free-running dev PER (greedy + beam), train PER, and
the teacher-forced dev accuracy — the acc-vs-PER gap IS the exposure
bias being measured.

    python experiments/exposure_bias.py [--platform tpu]
        [--labeled 512] [--steps 3000] [--arm all]
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = ("ctc_ref", "tf10", "tf09", "tf07", "tf05", "mwer")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--labeled", type=int, default=512)
    p.add_argument("--grammar", type=int, default=3)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--dev-utts", type=int, default=64)
    p.add_argument("--workdir", default="/tmp/exposure_bias")
    p.add_argument("--arm", default="all", choices=["all", *ARMS])
    args, overrides = p.parse_known_args()

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset
    from semi_supervised_asr_tpu.training.solver import Solver

    def arm_overrides(name):
        if name == "ctc_ref":
            return ["model.family=ctc"]
        ss = {"tf10": 1.0, "tf09": 0.9, "tf07": 0.7, "tf05": 0.5,
              "mwer": 0.7}
        ov = [
            "objective.tf_rate_start=1.0",
            f"objective.tf_rate_end={ss[name]}",
            f"objective.tf_decay_steps={int(args.steps * 0.6)}",
        ]
        if name == "mwer":
            ov += [
                "objective.lambda_mwer=0.2",
                "objective.mwer_beam=4",
                f"objective.mwer_warmup_steps={int(args.steps * 0.6)}",
            ]
        return ov

    results = {"labeled": args.labeled, "grammar": args.grammar,
               "steps": args.steps}
    arms = ARMS if args.arm == "all" else (args.arm,)
    for name in arms:
        cfg = load_config("configs/synthetic_smoke.yaml", [
            f"data.num_synthetic_utts={args.labeled}",
            f"data.synthetic_grammar={args.grammar}",
            "frontend.spec_augment=true",
            "train.batch_size=16",
            "train.learning_rate=0.001",
            f"train.total_steps={args.steps}",
            f"train.eval_every={args.steps}",
            f"train.ckpt_every={args.steps}",
            "train.log_every=250",
            *arm_overrides(name),
            *overrides,
        ])
        solver = Solver(cfg, f"{args.workdir}/{name}", use_mesh=False)
        solver.bundle.dev = SyntheticDataset(
            solver.vocab,
            dc.replace(cfg.data,
                       synthetic_seed=cfg.data.synthetic_seed + 1),
            cfg.frontend, n_utts=args.dev_utts,
        )
        t0 = time.perf_counter()
        solver.train()
        wall = time.perf_counter() - t0
        dev_g, _, _ = solver._score_batches(
            solver.bundle.dev, solver.state.params, "greedy"
        )
        dev_b, _, _ = solver._score_batches(
            solver.bundle.dev, solver.state.params, "beam"
        )
        train_g, _, _ = solver._score_batches(
            solver.bundle.train, solver.state.params, "greedy"
        )
        results[f"{name}_dev_per_greedy"] = round(dev_g, 4)
        results[f"{name}_dev_per_beam"] = round(dev_b, 4)
        results[f"{name}_train_per"] = round(train_g, 4)
        results[f"{name}_wall_s"] = round(wall, 1)
        print(f"# {name}: train {train_g:.3f} dev greedy {dev_g:.3f} "
              f"beam {dev_b:.3f} wall {wall:.0f}s", file=sys.stderr)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
