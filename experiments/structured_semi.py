"""Semi-supervised vs supervised on a STRUCTURED synthetic language.

The earlier semi_vs_supervised.py run recorded an honest negative result
and diagnosed it: iid-random transcripts give the text-AE/pseudo-label
terms no structure to exploit.  This experiment fixes the task, not the
claim — data.synthetic_grammar=K makes transcripts follow a sparse Markov
grammar SHARED by the labeled, unlabeled, and dev streams, which is the
regime semi-supervised ASR assumes (unlabeled data carries the language's
regularities).

    python experiments/structured_semi.py [--platform tpu] [--arm X]

Arms: supervised | text_ae | pseudo | both — each prints train/dev PER;
the JSON line at the end collects them.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = {
    "supervised": {},
    "text_ae": {"lambda_text_ae": 0.3},
    "pseudo": {"lambda_pseudo": 0.5, "use_ema_teacher": True,
               "ema_decay": 0.995, "pseudo_confidence": 0.5},
    "both": {"lambda_text_ae": 0.3, "lambda_pseudo": 0.5,
             "use_ema_teacher": True, "ema_decay": 0.995,
             "pseudo_confidence": 0.5},
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--labeled", type=int, default=48)
    p.add_argument("--unlabeled", type=int, default=384)
    p.add_argument("--grammar", type=int, default=3)
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--warmup", type=int, default=1000)
    p.add_argument("--dev-utts", type=int, default=64)
    p.add_argument("--workdir", default="/tmp/structured_semi")
    p.add_argument("--arm", default="all", choices=["all", *ARMS])
    args, overrides = p.parse_known_args()

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend: under the
        # axon plugin the chip registers programmatically and
        # jax_platforms="tpu" would probe a native TPU and fail

    import dataclasses as dc

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset
    from semi_supervised_asr_tpu.training.solver import Solver

    base = load_config("configs/synthetic_smoke.yaml", [
        f"data.num_synthetic_utts={args.labeled}",
        f"data.synthetic_grammar={args.grammar}",
        "train.batch_size=16",
        "train.learning_rate=0.002",
        f"train.total_steps={args.steps}",
        f"train.eval_every={args.steps}",
        f"train.ckpt_every={args.steps}",
        "train.log_every=250",
        f"objective.pseudo_warmup_steps={args.warmup}",
        *overrides,
    ])

    results = {"grammar": args.grammar, "labeled": args.labeled,
               "unlabeled": args.unlabeled, "steps": args.steps}
    arms = ARMS if args.arm == "all" else {args.arm: ARMS[args.arm]}
    for name, overrides in arms.items():
        cfg = base.replace(
            objective=dc.replace(base.objective, **overrides)
        )
        solver = Solver(cfg, f"{args.workdir}/{name}", use_mesh=False)
        # bigger dev set than the registry default for stable PER
        solver.bundle.dev = SyntheticDataset(
            solver.vocab,
            dc.replace(cfg.data, synthetic_seed=cfg.data.synthetic_seed + 1),
            cfg.frontend, n_utts=args.dev_utts,
        )
        if overrides:
            solver.bundle.unlabeled_audio = SyntheticDataset(
                solver.vocab,
                dc.replace(cfg.data,
                           synthetic_seed=cfg.data.synthetic_seed + 2),
                cfg.frontend, n_utts=args.unlabeled, labeled=False,
            )
            solver.bundle.unlabeled_text = SyntheticDataset(
                solver.vocab,
                dc.replace(cfg.data,
                           synthetic_seed=cfg.data.synthetic_seed + 3),
                cfg.frontend, n_utts=args.unlabeled,
            )
        solver.train()
        dev, _, _ = solver._score_batches(
            solver.bundle.dev, solver.state.params, "greedy"
        )
        train, _, _ = solver._score_batches(
            solver.bundle.train, solver.state.params, "greedy"
        )
        results[f"{name}_dev_per"] = round(dev, 4)
        results[f"{name}_train_per"] = round(train, 4)
        print(f"# {name}: train PER {train:.3f} dev PER {dev:.3f}",
              file=sys.stderr)

    if "supervised_dev_per" in results:
        for name in ("text_ae", "pseudo", "both"):
            if f"{name}_dev_per" in results:
                results[f"{name}_improves"] = (
                    results[f"{name}_dev_per"]
                    < results["supervised_dev_per"]
                )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
