"""Conv-stem accuracy parity study (VERDICT r1 #6).

configs/ls960_dp.yaml ships ``conv_subsample: 1`` for a measured 1.35x
step-time win, but the stem CHANGES the model: total time reduction goes
from the LAS-canonical 8x (3 pyramid layers) to 16x, i.e. roughly one
encoder frame per ~1.3 output tokens on this corpus — the regime where
attention could starve.  Perf wins that silently trade accuracy violate
the parity contract (BASELINE.json:2), so this experiment holds the
training budget fixed and compares dev PER on the structured-grammar
corpus (the same corpus where semi-supervised wins were measured,
experiments/README.md):

    python experiments/conv_stem.py [--platform tpu] [--steps 3000]

Arms: conv0 (enc_layers=3, 8x reduction) | conv1 (enc_layers=3 + stride-2
conv stem, 16x reduction).  Prints one JSON line with dev/train PER and
mean step time per arm; the verdict feeds the recipe comment in
configs/ls960_dp.yaml.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = {"conv0": 0, "conv1": 1}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--labeled", type=int, default=96)
    p.add_argument("--grammar", type=int, default=3)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--dev-utts", type=int, default=64)
    p.add_argument("--workdir", default="/tmp/conv_stem")
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

    results = {"labeled": args.labeled, "grammar": args.grammar,
               "steps": args.steps}
    arms = ARMS if args.arm == "all" else {args.arm: ARMS[args.arm]}
    for name, conv in arms.items():
        # enc_layers=3 mirrors the flagship's pyramid depth: conv=0 is
        # the LAS-canonical 8x reduction, conv=1 the shipped 16x
        cfg = load_config("configs/synthetic_smoke.yaml", [
            f"data.num_synthetic_utts={args.labeled}",
            f"data.synthetic_grammar={args.grammar}",
            "model.enc_layers=3",
            f"model.conv_subsample={conv}",
            "train.batch_size=16",
            "train.learning_rate=0.002",
            f"train.total_steps={args.steps}",
            f"train.eval_every={args.steps}",
            f"train.ckpt_every={args.steps}",
            "train.log_every=250",
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
        dev, _, _ = solver._score_batches(
            solver.bundle.dev, solver.state.params, "greedy"
        )
        train, _, _ = solver._score_batches(
            solver.bundle.train, solver.state.params, "greedy"
        )
        results[f"{name}_dev_per"] = round(dev, 4)
        results[f"{name}_train_per"] = round(train, 4)
        results[f"{name}_wall_s"] = round(wall, 1)
        print(f"# {name}: train PER {train:.3f} dev PER {dev:.3f} "
              f"wall {wall:.0f}s", file=sys.stderr)

    if "conv0_dev_per" in results and "conv1_dev_per" in results:
        results["per_delta_conv1_minus_conv0"] = round(
            results["conv1_dev_per"] - results["conv0_dev_per"], 4
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
