"""Three-family study: LAS vs transducer vs CTC on the structured grammar.

Same corpus/budget discipline as the other experiments (structured
Markov grammar so dev has learnable structure, one seed, equal steps):
each model family trains supervised on the same labeled set at
flagship-shaped small dims, then scores dev with its own greedy AND
beam decode.  The question the study answers for the recipes: how much
accuracy does each paradigm give up at small data, and what does the
beam buy each family.

    python experiments/family_study.py [--platform tpu] [--steps 3000]

Prints one JSON line; results recorded in experiments/README.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = {
    "las": [],
    "transducer": [
        "model.family=transducer",
        "model.pred_hidden=128", "model.joint_dim=128",
        "decode.max_symbols=4",
    ],
    "ctc": ["model.family=ctc"],
}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--labeled", type=int, default=96)
    p.add_argument("--grammar", type=int, default=3)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--dev-utts", type=int, default=64)
    p.add_argument("--beam", type=int, default=4)
    p.add_argument("--workdir", default="/tmp/family_study")
    p.add_argument("--arm", default="all", choices=["all", *ARMS])
    args, overrides = p.parse_known_args()

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)

    import dataclasses as dc

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset
    from semi_supervised_asr_tpu.training.solver import Solver

    results = {"labeled": args.labeled, "grammar": args.grammar,
               "steps": args.steps, "beam": args.beam}
    arms = ARMS if args.arm == "all" else {args.arm: ARMS[args.arm]}
    for name, extra in arms.items():
        cfg = load_config("configs/synthetic_smoke.yaml", [
            f"data.num_synthetic_utts={args.labeled}",
            f"data.synthetic_grammar={args.grammar}",
            "train.batch_size=16",
            "train.learning_rate=0.002",
            f"train.total_steps={args.steps}",
            f"train.eval_every={args.steps}",
            f"train.ckpt_every={args.steps}",
            "train.log_every=250",
            f"decode.beam_size={args.beam}",
            *extra,
            *overrides,
        ])
        solver = Solver(cfg, f"{args.workdir}/{name}", use_mesh=False)
        solver.bundle.dev = SyntheticDataset(
            solver.vocab,
            dc.replace(cfg.data, synthetic_seed=cfg.data.synthetic_seed + 1),
            cfg.frontend, n_utts=args.dev_utts,
        )
        t0 = time.perf_counter()
        solver.train()
        wall = time.perf_counter() - t0
        for mode in ("greedy", "beam"):
            dev, _, _ = solver._score_batches(
                solver.bundle.dev, solver.state.params, mode
            )
            results[f"{name}_dev_per_{mode}"] = round(dev, 4)
        train, _, _ = solver._score_batches(
            solver.bundle.train, solver.state.params, "greedy"
        )
        results[f"{name}_train_per"] = round(train, 4)
        results[f"{name}_wall_s"] = round(wall, 1)
        print(
            f"# {name}: train PER {train:.3f} dev greedy "
            f"{results[f'{name}_dev_per_greedy']:.3f} beam "
            f"{results[f'{name}_dev_per_beam']:.3f} wall {wall:.0f}s",
            file=sys.stderr,
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
