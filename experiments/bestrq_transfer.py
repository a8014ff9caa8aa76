"""BEST-RQ pretraining transfer study on the structured grammar.

Does masked-prediction pretraining of the listener on UNLABELED AUDIO
(objectives/best_rq.py) help downstream supervised training at small
labeled-data scale — the regime where the in-step semi terms showed
their win (experiments/README.md, structured_semi.py)?

    python experiments/bestrq_transfer.py [--platform tpu] [--steps 2500]

Arms (equal finetune budget, same labeled set, same seed):
* scratch      — supervised only, random init;
* bestrq       — pretrain on the unlabeled audio stream, then the same
                 supervised run from the pretrained listener;
* bestrq_froz  — same, with the listener frozen (train.freeze) — a
                 linear-probe-style control: does the pretrained
                 representation alone carry the task?

Prints one JSON line with dev/train PER per arm.
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--labeled", type=int, default=48)
    p.add_argument("--unlabeled", type=int, default=512)
    p.add_argument("--grammar", type=int, default=3)
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--pretrain-steps", type=int, default=2000)
    p.add_argument("--dev-utts", type=int, default=64)
    p.add_argument("--workdir", default="/tmp/bestrq_transfer")
    p.add_argument("--arm", default="all",
                   choices=["all", "scratch", "bestrq", "bestrq_froz"])
    args, overrides = p.parse_known_args()

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend (axon registers itself)

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset
    from semi_supervised_asr_tpu.training.pretrain import train_bestrq
    from semi_supervised_asr_tpu.training.solver import Solver

    base = [
        f"data.synthetic_grammar={args.grammar}",
        "frontend.spec_augment=true",
        "train.batch_size=16",
        "train.learning_rate=0.002",
        f"train.total_steps={args.steps}",
        f"train.eval_every={args.steps}",
        f"train.ckpt_every={args.steps}",
        "train.log_every=250",
        *overrides,
    ]
    results = {"labeled": args.labeled, "unlabeled": args.unlabeled,
               "grammar": args.grammar, "steps": args.steps,
               "pretrain_steps": args.pretrain_steps}

    # ---- pretraining stage (shared by both bestrq arms) -------------- #
    arms = (["scratch", "bestrq", "bestrq_froz"]
            if args.arm == "all" else [args.arm])
    brq_dir = f"{args.workdir}/brq"
    if any(a.startswith("bestrq") for a in arms):
        pcfg = load_config("configs/synthetic_smoke.yaml", base + [
            # the unlabeled stream: more utts, DIFFERENT seed than the
            # labeled set (same grammar => same "language")
            f"data.num_synthetic_utts={args.unlabeled}",
            "data.synthetic_seed=4321",
            f"pretrain.total_steps={args.pretrain_steps}",
            "pretrain.log_every=250",
        ])
        out = train_bestrq(pcfg, brq_dir, use_mesh=False)
        results["pretrain_loss"] = round(out["loss"], 4)
        results["pretrain_mask_acc"] = round(out["mask_acc"], 4)
        results["pretrain_codes_used"] = round(out["codes_used"], 4)
        print(f"# pretrain: loss {out['loss']:.3f} mask_acc "
              f"{out['mask_acc']:.3f} codes {out['codes_used']:.3f}",
              file=sys.stderr)

    # ---- finetune arms ------------------------------------------------ #
    for name in arms:
        over = list(base) + [f"data.num_synthetic_utts={args.labeled}"]
        if name.startswith("bestrq"):
            over.append(f"train.init_encoder_from={brq_dir}")
        if name == "bestrq_froz":
            over.append('train.freeze=["listener"]')
        cfg = load_config("configs/synthetic_smoke.yaml", over)
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

    if "scratch_dev_per" in results and "bestrq_dev_per" in results:
        results["per_delta_bestrq_minus_scratch"] = round(
            results["bestrq_dev_per"] - results["scratch_dev_per"], 4
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
