"""C4 acceptance experiment: semi-supervised > supervised-only (synthetic).

Setup mirroring BASELINE.json:10's shape at toy scale: few labeled
utterances, many unlabeled ones from the same distribution (shared token
signatures), a held-out dev set.  The pseudo-label + text-AE terms should
recover accuracy the labeled set alone cannot reach.

    python experiments/semi_vs_supervised.py [--platform cpu]

Prints one JSON line: {"supervised_per": ..., "semi_per": ..., ...}.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--labeled", type=int, default=48)
    p.add_argument("--unlabeled", type=int, default=192)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--warmup", type=int, default=800)
    p.add_argument("--workdir", default="/tmp/semi_exp")
    p.add_argument("--arm", default="both",
                   choices=["both", "supervised", "semi"],
                   help="run one arm only (each arm fits a 10-min budget)")
    args = p.parse_args()

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend: under the
        # axon plugin the chip registers programmatically and
        # jax_platforms="tpu" would probe a native TPU and fail

    import dataclasses

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset
    from semi_supervised_asr_tpu.training.solver import Solver

    base = load_config("configs/synthetic_smoke.yaml", [
        f"data.num_synthetic_utts={args.labeled}",
        "train.batch_size=16",
        "train.learning_rate=0.002",
        f"train.total_steps={args.steps}",
        f"train.eval_every={args.steps}",
        f"train.ckpt_every={args.steps}",
        "train.log_every=100",
    ])

    results = {}
    arms = (
        ("supervised", {}),
        ("semi", {"lambda_pseudo": 0.5, "lambda_text_ae": 0.2,
                  "use_ema_teacher": True, "ema_decay": 0.995,
                  "pseudo_warmup_steps": args.warmup,
                  "pseudo_confidence": 0.5}),
    )
    if args.arm != "both":
        arms = tuple(a for a in arms if a[0] == args.arm)
    for name, overrides in arms:
        cfg = base.replace(
            objective=dataclasses.replace(base.objective, **overrides)
        )
        solver = Solver(cfg, f"{args.workdir}/{name}", use_mesh=False)
        if name == "semi":
            # many unlabeled utterances from the same distribution
            import dataclasses as dc

            ucfg = dc.replace(cfg.data,
                              synthetic_seed=cfg.data.synthetic_seed + 2)
            tcfg = dc.replace(cfg.data,
                              synthetic_seed=cfg.data.synthetic_seed + 3)
            solver.bundle.unlabeled_audio = SyntheticDataset(
                solver.vocab, ucfg, cfg.frontend, n_utts=args.unlabeled
            )
            solver.bundle.unlabeled_text = SyntheticDataset(
                solver.vocab, tcfg, cfg.frontend, n_utts=args.unlabeled
            )
        solver.train()
        rate, _, _ = solver._score_batches(
            solver.bundle.dev, solver.state.params, "greedy"
        )
        train_rate, _, _ = solver._score_batches(
            solver.bundle.train, solver.state.params, "greedy"
        )
        results[f"{name}_dev_per"] = round(rate, 4)
        results[f"{name}_train_per"] = round(train_rate, 4)
        print(f"# {name}: train PER {train_rate:.3f} dev PER {rate:.3f}",
              file=sys.stderr)

    if "semi_dev_per" in results and "supervised_dev_per" in results:
        results["semi_improves"] = (
            results["semi_dev_per"] < results["supervised_dev_per"]
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
