"""Noise-augmentation robustness study at equal budget.

`frontend.noise_aug_prob` (on-device MUSAN-style additive noise,
ops/frontend.noise_augment) claims ROBUSTNESS, not clean-set accuracy:
training with noise mixed in should hold PER on a noisy dev set where a
clean-trained model degrades, at no clean-dev cost.  This runs the same
equal-budget structured-grammar harness as the other studies
(`model.family=ctc`, the family study's tiny-data winner, default
pBLSTM listener) with two arms:

    clean  — noise_aug_prob=0.0 (the old training path)
    noised — noise_aug_prob=0.7, snr 0..15 dB, white+babble

and scores BOTH arms on BOTH dev conditions: the clean dev set and a
noisy copy (host-side white noise at a fixed 5 dB SNR, seeded — the
matched-condition probe).  Read the result as "does the knob buy
robustness at the scale this corpus can measure", not as a MUSAN/CHiME
verdict.

    python experiments/noise_robustness.py [--platform tpu] \
        [--labeled 512] [--steps 3000] [--dev-snr-db 5]
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

ARMS = {"clean": 0.0, "noised": 0.7}


class NoisyDev:
    """Dev-set wrapper: adds seeded white noise at a fixed SNR on host.

    Mirrors ops/frontend.noise_augment's exact-SNR convention (gain
    solved from signal power over the valid samples) so the dev
    condition matches what the train-time knob produces, but runs in
    numpy on the host: eval must corrupt the SOURCE audio, not ride the
    augment-only train path.
    """

    def __init__(self, base, snr_db: float, seed: int = 7):
        self._base = base
        self._snr_db = snr_db
        self._seed = seed

    def __len__(self) -> int:
        return len(self._base)

    def __getitem__(self, i: int):
        utt = self._base[i]
        rng = np.random.default_rng((self._seed, i))
        noise = rng.standard_normal(utt.audio.shape).astype(np.float32)
        p_sig = float(np.mean(np.square(utt.audio)))
        p_noise = float(np.mean(np.square(noise)))
        gain = np.sqrt(p_sig / (p_noise * 10.0 ** (self._snr_db / 10.0)))
        return dc.replace(utt, audio=utt.audio + gain.astype(np.float32) * noise)

    def audio_len(self, i: int) -> int:
        return self._base.audio_len(i)

    def token_len(self, i: int) -> int:
        return self._base.token_len(i)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--labeled", type=int, default=512)
    p.add_argument("--grammar", type=int, default=3)
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--dev-utts", type=int, default=64)
    p.add_argument("--dev-snr-db", type=float, default=5.0)
    p.add_argument("--workdir", default="/tmp/noise_robustness")
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
               "steps": args.steps, "dev_snr_db": args.dev_snr_db}
    arms = ARMS if args.arm == "all" else {args.arm: ARMS[args.arm]}
    for name, prob in arms.items():
        cfg = load_config("configs/synthetic_smoke.yaml", [
            f"data.num_synthetic_utts={args.labeled}",
            f"data.synthetic_grammar={args.grammar}",
            "frontend.spec_augment=true",
            f"frontend.noise_aug_prob={prob}",
            "frontend.noise_snr_db=[0,15]",
            "model.family=ctc",
            "train.batch_size=16",
            f"train.total_steps={args.steps}",
            f"train.eval_every={args.steps}",
            f"train.ckpt_every={args.steps}",
            "train.log_every=250",
            *overrides,
        ])
        solver = Solver(cfg, f"{args.workdir}/{name}", use_mesh=False)
        clean_dev = SyntheticDataset(
            solver.vocab,
            dc.replace(cfg.data, synthetic_seed=cfg.data.synthetic_seed + 1),
            cfg.frontend, n_utts=args.dev_utts,
        )
        t0 = time.perf_counter()
        solver.train()
        wall = time.perf_counter() - t0
        for cond, dev in (
            ("clean", clean_dev),
            ("noisy", NoisyDev(clean_dev, args.dev_snr_db)),
        ):
            solver.bundle.dev = dev
            per, _, _ = solver._score_batches(dev, solver.state.params,
                                              "greedy")
            results[f"{name}_dev_{cond}_per"] = round(per, 4)
            print(f"# {name}/{cond}: dev PER {per:.3f}", file=sys.stderr)
        results[f"{name}_wall_s"] = round(wall, 1)

    if all(f"{a}_dev_noisy_per" in results for a in ARMS):
        results["noisy_delta_noised_minus_clean"] = round(
            results["noised_dev_noisy_per"] - results["clean_dev_noisy_per"], 4
        )
        results["clean_delta_noised_minus_clean"] = round(
            results["noised_dev_clean_per"] - results["clean_dev_clean_per"], 4
        )
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
