"""Conformer depth study: enc_blocks 16 vs 12 at equal budget.

DESIGN.md's remaining lever (a): `configs/ls960_conformer.yaml` ships
enc_blocks=16 (Gulati 2020's "large" depth at this d_model); 12 blocks
would cut the encoder's step time ~25% IF quality holds.  Real-corpus
evidence is unavailable in this image, so this runs the same
equal-budget harness as the other architecture studies
(experiments/README.md): structured-grammar corpus, fixed steps, dev
PER per arm.  Read the result as "does depth change anything at the
scale this corpus can measure", not as an LS-960 verdict.

Arms run noam warmup + `model.family=ctc` by default (same harness as
chunked_conformer.py): the original 2026-08-19 run used a flat LR and
BOTH arms stalled at train PER ~0.9 — an optimization failure (no
warmup), not the data hunger the first write-up assumed.  With
`lr_schedule=noam warmup_steps=500 lr=0.002` the CTC harness fits the
train set (PER ~0.001, chunked_conformer.py, 2026-08-20) so the arms
can differentiate; the LAS decoder still cannot decode a conformer
encoder at this scale even under the working schedule (2026-08-20
noam/LAS run: ~0.8 teacher-forced acc but 0.85-0.93 dev PER — exposure
bias), so per-frame supervision is the only harness where depth could
show up here.

RESOLVED (2026-08-20, experiments/README.md): under the 8-block
schedule both 12- and 16-block arms stall (~0.9 PER); re-probing
blocks12 with `train.warmup_steps=1500 train.learning_rate=0.001`
fits (train PER 0.027) — warmup requirement scales with depth, so
depth cannot be ranked at this corpus size, but enc_blocks changes
must re-tune the schedule.

    python experiments/conformer_blocks.py [--platform tpu] \
        [--labeled 512] [--steps 3000]
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = {"blocks12": 12, "blocks16": 16}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--labeled", type=int, default=512)
    p.add_argument("--grammar", type=int, default=3)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--dev-utts", type=int, default=64)
    p.add_argument("--workdir", default="/tmp/conformer_blocks")
    p.add_argument("--arm", default="all", choices=["all", *ARMS])
    args, overrides = p.parse_known_args()

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend (axon registers itself)

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset
    from semi_supervised_asr_tpu.training.solver import Solver

    results = {"labeled": args.labeled, "grammar": args.grammar,
               "steps": args.steps}
    arms = ARMS if args.arm == "all" else {args.arm: ARMS[args.arm]}
    for name, blocks in arms.items():
        # dims mirror the encoder-arch study (experiments/README.md):
        # d_model=128, conv_subsample=2 (4x reduction), SpecAugment on
        # (the conformer recipes all regularize)
        cfg = load_config("configs/synthetic_smoke.yaml", [
            f"data.num_synthetic_utts={args.labeled}",
            f"data.synthetic_grammar={args.grammar}",
            "frontend.spec_augment=true",
            "model.family=ctc",
            "model.encoder_arch=conformer",
            "model.enc_heads=4",
            "model.enc_ff_dim=256",
            f"model.enc_blocks={blocks}",
            "model.conv_subsample=2",
            "model.enc_dropout=0.1",
            "train.batch_size=16",
            # noam warmup is REQUIRED for the conformer to train at all
            # at this scale (module docstring); overrides can still
            # reproduce the flat-LR stall
            "train.learning_rate=0.002",
            "train.lr_schedule=noam",
            "train.warmup_steps=500",
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

    if all(f"{a}_dev_per" in results for a in ARMS):
        results["per_delta_b12_minus_b16"] = round(
            results["blocks12_dev_per"] - results["blocks16_dev_per"], 4
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
