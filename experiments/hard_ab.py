"""Soak-scale semi-vs-supervised A/B on the HARD corpus (r5 punch #1+#2).

The framework's namesake claim — semi-supervision helps — had only ever
been measured at toy scale (structured_semi: −26% rel at 96+512 utts);
every at-scale corpus until round 5 saturated at dev WER 0.0000.  This
harness runs the claim at real dimensions on the hard-mode corpus
(calibrated nonzero error floor; data/synthetic.py hard_params):

  1. calibrate: short supervised runs over a difficulty grid on a
     mid-scale corpus -> the measured difficulty→dev-WER curve that
     picks the A/B's knob (target: supervised plateau in 5-25% WER).
  2. arm: one full training arm (supervised | semi) on a fabricated
     corpus, driven through the REAL CLI under the soak watchdog
     (exec-restart + kill/resume robustness active), then --test.
  3. report: the delta table from both arms' workdirs.

Usage:
  python experiments/hard_ab.py fabricate --root /tmp/hard_ls \
      --difficulty 0.8 --labeled 20000 --unlabeled 40000
  python experiments/hard_ab.py arm --root /tmp/hard_ls \
      --arm supervised --workdir /tmp/ab_sup --steps 6000
  python experiments/hard_ab.py arm --root /tmp/hard_ls \
      --arm semi --workdir /tmp/ab_semi --steps 6000
  python experiments/hard_ab.py report --sup /tmp/ab_sup \
      --semi /tmp/ab_semi --out experiments/hard_ab_report.json
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CONFIG = str(REPO / "configs" / "ls100_semi.yaml")
WATCHDOG = str(REPO / "experiments" / "soak_watchdog.sh")


def fabricate(args) -> int:
    cmd = [
        sys.executable, str(REPO / "experiments" / "soak_corpus.py"),
        "--root", args.root, "--difficulty", str(args.difficulty),
        "--labeled", str(args.labeled), "--unlabeled", str(args.unlabeled),
        "--dev", str(args.dev), "--test", str(args.test),
    ]
    subprocess.run(cmd, check=True)
    out = Path(args.root) / "out"
    subprocess.run([
        sys.executable, "-m", "semi_supervised_asr_tpu.data.preprocess",
        "librispeech", "--root", args.root, "--out", str(out),
        "--splits", "train-clean-100,train-clean-360,dev-clean,test-clean",
    ], check=True, cwd=REPO)
    print(json.dumps({"root": args.root, "manifests": str(out),
                      "difficulty": args.difficulty}))
    return 0


def _arm_overrides(args) -> list[str]:
    """CLI overrides shared by both arms: the r4 soak schedule scaled to
    --steps, the soak's proven restart knobs, and the corpus wiring."""
    ov = [
        f"data.data_dir={args.root}/out",
        "data.test_split=test-clean",
        f"train.compile_cache_dir={args.compile_cache}",
        f"train.total_steps={args.steps}",
        f"train.warmup_steps={max(args.steps // 10, 100)}",
        f"train.decay_steps={args.steps}",
        "train.learning_rate=0.0007",
        f"train.eval_every={args.eval_every}",
        f"train.ckpt_every={args.eval_every}",
        "train.log_every=50",
        "train.exec_restart_every=1800",
        "train.async_ckpt=true",
        f"train.batch_size={args.batch}",
        f"data.grain_threads={args.grain_threads}",
        # scale the recipe's pseudo-warmup gate (15% of total_steps at
        # 200k) to this arm's budget: the teacher must clear its noise
        # floor before the consistency term goes live — on the hard
        # corpus a step-0 teacher emits garbage pseudo-labels
        f"objective.pseudo_warmup_steps={max(args.steps // 6, 1)}",
    ]
    if args.arm == "supervised":
        # SAME config minus the unlabeled terms: equal labeled data,
        # equal schedule, equal everything else
        ov += [
            "objective.lambda_text_ae=0",
            "objective.lambda_pseudo=0",
            "data.unlabeled_audio_split=",
            "data.unlabeled_text_split=",
        ]
    return ov + list(args.override or [])


def arm(args) -> int:
    wd = Path(args.workdir)
    wd.mkdir(parents=True, exist_ok=True)
    plat = ["--platform", args.platform] if args.platform else []
    train_cmd = [
        sys.executable, "-m", "semi_supervised_asr_tpu.main",
        "--config", CONFIG, "--train", "--resume", *plat,
        "--workdir", str(wd), "--",
        *_arm_overrides(args),
    ]
    t0 = time.time()
    # the watchdog turns tunnel wedges into bounded hiccups (kill group,
    # resume exactly); rc!=0 propagates (livelock breaker aborts loudly)
    r = subprocess.run(
        ["bash", WATCHDOG, str(wd), str(wd / "wd"), "--", *train_cmd],
        cwd=REPO,
    )
    if r.returncode != 0:
        print(json.dumps({"arm": args.arm, "error":
                          f"watchdog rc={r.returncode}"}))
        return r.returncode
    train_wall = time.time() - t0
    # test-clean, beam 5, with hypotheses retained for error analysis
    tr = subprocess.run(
        [sys.executable, "-m", "semi_supervised_asr_tpu.main",
         "--config", CONFIG, "--test", "--load-dir", str(wd), *plat,
         "--hyp-out", str(wd / "test_hyps.jsonl"), "--",
         *_arm_overrides(args)],
        cwd=REPO, capture_output=True, text=True,
    )
    test_json = {}
    for line in reversed(tr.stdout.strip().splitlines()):
        try:
            test_json = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    if not test_json:
        print(tr.stdout[-2000:], tr.stderr[-2000:], file=sys.stderr)
    result = {
        "arm": args.arm, "workdir": str(wd), "steps": args.steps,
        "train_wall_s": round(train_wall, 1), "test": test_json,
        "dev_trajectory": _dev_trajectory(wd),
    }
    (wd / "arm_result.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result))
    return 0 if test_json else 1


def _dev_trajectory(wd: Path) -> list[dict]:
    out = []
    mpath = wd / "metrics.jsonl"
    if not mpath.exists():
        return out
    for line in open(mpath):
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if r.get("prefix") == "dev":
            out.append({k: r[k] for k in
                        ("step", "dev_error", "dev_wer",
                         "dev_cap_hit_rate") if k in r})
    return out


def _load_arm(wd: Path) -> dict:
    """arm_result.json, or a trajectory-only record rebuilt from
    metrics.jsonl — a truncated arm (session end mid-run) still
    compares against the other arm at matched eval steps."""
    f = wd / "arm_result.json"
    if f.exists():
        return json.loads(f.read_text())
    return {"workdir": str(wd), "test": {},
            "truncated": True, "dev_trajectory": _dev_trajectory(wd)}


def report(args) -> int:
    sup = _load_arm(Path(args.sup))
    semi = _load_arm(Path(args.semi))
    s_wer = sup["test"].get("wer")
    m_wer = semi["test"].get("wer")
    rel = (None if not s_wer or m_wer is None
           else round((s_wer - m_wer) / s_wer, 4))
    # dev WER at every eval step BOTH arms reached — the matched-budget
    # comparison that survives one arm being truncated
    s_dev = {r["step"]: r for r in sup.get("dev_trajectory", [])}
    m_dev = {r["step"]: r for r in semi.get("dev_trajectory", [])}
    matched = [
        {"step": s,
         "dev_wer_supervised": s_dev[s].get("dev_wer"),
         "dev_wer_semi": m_dev[s].get("dev_wer")}
        for s in sorted(set(s_dev) & set(m_dev))
    ]
    rep = {
        "supervised": sup, "semi": semi,
        "test_wer_supervised": s_wer, "test_wer_semi": m_wer,
        "semi_rel_improvement": rel,
        "semi_improves": (m_wer < s_wer) if None not in (s_wer, m_wer)
        else None,
        "matched_dev_trajectory": matched,
    }
    Path(args.out).write_text(json.dumps(rep, indent=1))
    print(json.dumps({k: rep[k] for k in
                      ("test_wer_supervised", "test_wer_semi",
                       "semi_rel_improvement", "semi_improves",
                       "matched_dev_trajectory")}))
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("fabricate")
    f.add_argument("--root", required=True)
    f.add_argument("--difficulty", type=float, required=True)
    f.add_argument("--labeled", type=int, default=20000)
    f.add_argument("--unlabeled", type=int, default=40000)
    f.add_argument("--dev", type=int, default=512)
    f.add_argument("--test", type=int, default=512)
    f.set_defaults(fn=fabricate)

    a = sub.add_parser("arm")
    a.add_argument("--root", required=True)
    a.add_argument("--arm", required=True, choices=["supervised", "semi"])
    a.add_argument("--workdir", required=True)
    a.add_argument("--steps", type=int, default=6000)
    a.add_argument("--eval-every", type=int, default=1000)
    a.add_argument("--batch", type=int, default=64)
    a.add_argument("--grain-threads", type=int, default=0)
    a.add_argument("--compile-cache", default="/tmp/jit_cache_r5",
                   help="shared persistent XLA cache across arms — the "
                        "supervised arm's cells are the calibration "
                        "runs' cells, and eval decode cells are shared "
                        "by every run of the recipe shape")
    a.add_argument("--platform", default=None,
                   help="cpu for smokes; default = the attached chip")
    a.add_argument("--override", action="append", default=[])
    a.set_defaults(fn=arm)

    r = sub.add_parser("report")
    r.add_argument("--sup", required=True)
    r.add_argument("--semi", required=True)
    r.add_argument("--out", default="experiments/hard_ab_report.json")
    r.set_defaults(fn=report)

    args = p.parse_args()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
