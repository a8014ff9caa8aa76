"""Difficulty→dev-WER calibration curve for the hard-mode corpus.

VERDICT r4 next #1: before the soak-scale semi-vs-supervised A/B can
say anything, the fabricator's difficulty knob must be CALIBRATED — a
measured curve from ``data.synthetic_difficulty`` to the supervised dev
WER it produces, so the A/B picks a knob whose supervised arm plateaus
at a discriminating (nonzero, sub-saturation) error floor.

For each grid point this harness fabricates a mid-scale corpus
(default 4k labeled / 384 dev — cheap enough to sweep; the soak-scale
point is then run once via hard_ab.py on the chosen knob), trains the
SUPERVISED arm of configs/ls100_semi.yaml through the real CLI under
the soak watchdog, and reads the final dev record out of metrics.jsonl.

Usage:
    python experiments/calibrate_difficulty.py \
        --grid 0.5,0.7,0.9 --root-base /tmp/cal --steps 2000 \
        --out experiments/difficulty_curve.json

Each point costs one fabrication (~2 min host) + one training run
(~20 min on the v5e at the defaults).  Points whose workdir already
holds a final dev record are reused, so the sweep is resumable.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CONFIG = str(REPO / "configs" / "ls100_semi.yaml")
WATCHDOG = str(REPO / "experiments" / "soak_watchdog.sh")


def _final_dev(wd: Path, total_steps: int) -> dict | None:
    mpath = wd / "metrics.jsonl"
    if not mpath.exists():
        return None
    last = None
    for line in open(mpath):
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if r.get("prefix") == "dev" and r.get("step") == total_steps:
            last = r
    return last


def run_point(args, d: float) -> dict:
    tag = f"d{int(round(d * 100))}"
    root = Path(f"{args.root_base}_{tag}")
    wd = Path(f"{args.root_base}_{tag}_wd")
    done = _final_dev(wd, args.steps)
    if done is None:
        if not (root / "out").exists():
            subprocess.run([
                sys.executable, str(REPO / "experiments" / "soak_corpus.py"),
                "--root", str(root), "--difficulty", str(d),
                "--labeled", str(args.labeled), "--unlabeled", "0",
                "--dev", str(args.dev), "--test", "0",
            ], check=True)
            subprocess.run([
                sys.executable, "-m",
                "semi_supervised_asr_tpu.data.preprocess", "librispeech",
                "--root", str(root), "--out", str(root / "out"),
                "--splits", "train-clean-100,dev-clean",
            ], check=True, cwd=REPO)
        wd.mkdir(parents=True, exist_ok=True)
        train_cmd = [
            sys.executable, "-m", "semi_supervised_asr_tpu.main",
            "--config", CONFIG, "--train", "--resume",
            *(("--platform", args.platform) if args.platform else ()),
            "--workdir", str(wd), "--",
            f"data.data_dir={root}/out",
            # the supervised arm: the semi recipe minus the unlabeled
            # terms (hard_ab.py's _arm_overrides convention)
            "objective.lambda_text_ae=0", "objective.lambda_pseudo=0",
            "data.unlabeled_audio_split=", "data.unlabeled_text_split=",
            f"train.total_steps={args.steps}",
            f"train.warmup_steps={max(args.steps // 10, 100)}",
            f"train.decay_steps={args.steps}",
            "train.learning_rate=0.0007",
            "train.eval_every=500", "train.ckpt_every=500",
            "train.log_every=50", "train.exec_restart_every=1800",
            "train.async_ckpt=true", "train.batch_size=64",
            f"train.compile_cache_dir={args.compile_cache}",
        ]
        r = subprocess.run(["bash", WATCHDOG, str(wd), str(wd / "wd"),
                            "--", *train_cmd], cwd=REPO)
        if r.returncode != 0:
            return {"difficulty": d, "error": f"watchdog rc={r.returncode}"}
        done = _final_dev(wd, args.steps)
    from semi_supervised_asr_tpu.data.synthetic import hard_params
    return {
        "difficulty": d,
        "dev_wer": done.get("dev_wer") if done else None,
        "dev_cer": done.get("dev_error") if done else None,
        "dev_cap_hit_rate": done.get("dev_cap_hit_rate") if done else None,
        "acoustics": hard_params(d),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--grid", default="0.5,0.7,0.9")
    p.add_argument("--root-base", default="/tmp/cal")
    p.add_argument("--labeled", type=int, default=4000)
    p.add_argument("--dev", type=int, default=384)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--platform", default=None)
    p.add_argument("--compile-cache", default="/tmp/jit_cache_r5")
    p.add_argument("--out", default="experiments/difficulty_curve.json")
    args = p.parse_args()

    curve = [run_point(args, float(d)) for d in args.grid.split(",")]
    out = {
        "labeled": args.labeled, "steps": args.steps,
        "scale": "mid (curve shape); the soak-scale point runs via "
                 "hard_ab.py on the chosen knob",
        "curve": curve,
    }
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out["curve"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
