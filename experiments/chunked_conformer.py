"""Chunked-vs-full conformer context study at equal budget.

`model.enc_attn_chunk` (the streaming conformer,
configs/ls100_conformer_streaming.yaml) CHANGES the model: attention
loses everything right of the current chunk, the depthwise conv and the
stem turn causal.  The latency/throughput win is measured
(experiments/README.md streaming section); this asks what it costs in
accuracy, on the same equal-budget structured-grammar harness as the
other architecture studies.  The arms run `model.family=ctc` —
per-frame supervision, the family study's tiny-data winner.  Read the
result as "does chunking change anything at the scale this corpus can
measure", not as an LS-100 verdict.

Arms run noam warmup by default: the original 2026-08-19 run used a
flat LR and both arms stalled at train PER ~0.9, which the first
write-up read as conformer data hunger.  It was a missing warmup — the
same budget with `lr_schedule=noam warmup_steps=500 lr=0.002` fits the
train set (PER ~0.001) and the contrast resolves (experiments/README.md,
2026-08-20).

    python experiments/chunked_conformer.py [--platform tpu] \
        [--labeled 512] [--steps 3000]

Arms: full (enc_attn_chunk=0, offline context) | chunked
(enc_attn_chunk=16 encoder frames + 2 left chunks at the 4x stem rate —
the shipped streaming-recipe geometry).  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (enc_attn_chunk, enc_attn_left_chunks)
ARMS = {"full": (0, -1), "chunked": (16, 2)}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--labeled", type=int, default=512)
    p.add_argument("--grammar", type=int, default=3)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--dev-utts", type=int, default=64)
    p.add_argument("--workdir", default="/tmp/chunked_conformer")
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
    for name, (chunk, left) in arms.items():
        # dims mirror the conformer depth study (d_model=128,
        # conv_subsample=2); family=ctc per the module docstring
        cfg = load_config("configs/synthetic_smoke.yaml", [
            f"data.num_synthetic_utts={args.labeled}",
            f"data.synthetic_grammar={args.grammar}",
            "frontend.spec_augment=true",
            "model.family=ctc",
            "model.encoder_arch=conformer",
            "model.enc_heads=4",
            "model.enc_ff_dim=256",
            "model.enc_blocks=8",
            "model.conv_subsample=2",
            "model.enc_dropout=0.1",
            f"model.enc_attn_chunk={chunk}",
            f"model.enc_attn_left_chunks={left}",
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
        results["per_delta_chunked_minus_full"] = round(
            results["chunked_dev_per"] - results["full_dev_per"], 4
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
