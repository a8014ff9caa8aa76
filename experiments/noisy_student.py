"""Full noisy-student loop through the PUBLIC surfaces: teacher training →
``selftrain`` pseudo-labeling of unlabeled AUDIO FILES → student trained
from the labeled-∪-pseudo manifest — the offline counterpart of the
in-step consistency study (structured_semi.py), exercising the real
artifact chain (WAV files, jsonl manifests, ManifestDataset training).

    python experiments/noisy_student.py [--teacher-dir /tmp/ss2/supervised]

Prints {"teacher_dev_per", "student_dev_per", ...}.  Setup mirrors
structured_semi round 2: grammar=3, SpecAugment on, 96 labeled / 512
unlabeled, dev=64.
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TEACHER_OVERRIDES = [
    "data.num_synthetic_utts=96",
    "data.synthetic_grammar=3",
    "frontend.spec_augment=true",
    "train.batch_size=16",
    "train.learning_rate=0.002",
    "train.total_steps=3000",
    "train.eval_every=3000",
    "train.ckpt_every=3000",
    "train.log_every=500",
]


def write_wav_corpus(ds, out_dir: Path, sample_rate: int, labeled: bool,
                     name: str) -> Path:
    """Materialize a synthetic dataset as WAV files + a jsonl manifest."""
    from scipy.io import wavfile

    out_dir.mkdir(parents=True, exist_ok=True)
    manifest = out_dir / f"{name}.jsonl"
    with open(manifest, "w") as f:
        for i in range(len(ds)):
            utt = ds[i]
            data = np.clip(utt.audio * 32767, -32768, 32767).astype(np.int16)
            p = out_dir / f"{utt.uid}.wav"
            wavfile.write(p, sample_rate, data)
            e = {"uid": utt.uid, "audio": p.name,
                 "n_samples": len(utt.audio)}
            if labeled:
                e["text"] = utt.text
            f.write(json.dumps(e) + "\n")
    return manifest


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--teacher-dir", default=None,
                   help="existing teacher workdir (structured_semi round-2 "
                        "supervised arm); trains one if absent")
    p.add_argument("--unlabeled", type=int, default=512)
    p.add_argument("--keep-frac", type=float, default=0.75)
    p.add_argument("--student-steps", type=int, default=4000)
    p.add_argument("--workdir", default="/tmp/noisy_student")
    args = p.parse_args()

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend: under the
        # axon plugin the chip registers programmatically and
        # jax_platforms="tpu" would probe a native TPU and fail

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.data.synthetic import SyntheticDataset
    from semi_supervised_asr_tpu.selftrain import (
        pseudo_label_entries, read_manifest,
    )
    from semi_supervised_asr_tpu.training.solver import Solver

    wd = Path(args.workdir)
    tcfg = load_config("configs/synthetic_smoke.yaml", TEACHER_OVERRIDES)

    # -------- teacher --------
    tdir = Path(args.teacher_dir) if args.teacher_dir else wd / "teacher"
    teacher = Solver(tcfg, tdir, use_mesh=False)
    if teacher.ckpt.latest_step() is None:
        teacher.train()
    dev_ds = SyntheticDataset(
        teacher.vocab,
        dc.replace(tcfg.data, synthetic_seed=tcfg.data.synthetic_seed + 1),
        tcfg.frontend, n_utts=64,
    )
    teacher.bundle.dev = dev_ds
    t_per, _, _ = teacher._score_batches(
        dev_ds, teacher.eval_params(require_ckpt=True), "beam"
    )
    print(f"# teacher dev PER {t_per:.3f}", file=sys.stderr)

    # -------- materialize corpora as files + manifests --------
    sr = tcfg.frontend.sample_rate
    data_dir = wd / "data"
    labeled_man = write_wav_corpus(
        teacher.bundle.train, data_dir, sr, True, "labeled"
    )
    unlab_ds = SyntheticDataset(
        teacher.vocab,
        dc.replace(tcfg.data, synthetic_seed=tcfg.data.synthetic_seed + 2),
        tcfg.frontend, n_utts=args.unlabeled,
    )
    unlab_man = write_wav_corpus(unlab_ds, data_dir, sr, False, "unlabeled")
    write_wav_corpus(dev_ds, data_dir, sr, True, "dev")

    # -------- pseudo-label with the teacher (selftrain surface) --------
    labeled, stats = pseudo_label_entries(
        teacher, read_manifest(unlab_man), data_dir, mode="beam",
        keep_frac=args.keep_frac,
    )
    print(f"# selftrain: {stats}", file=sys.stderr)
    with open(data_dir / "train.jsonl", "w") as f:
        for e in read_manifest(labeled_man):
            f.write(json.dumps(e) + "\n")
        for e in labeled:
            f.write(json.dumps(e) + "\n")

    # -------- student on labeled ∪ pseudo --------
    scfg = load_config("configs/synthetic_smoke.yaml", [
        *TEACHER_OVERRIDES,
        "data.dataset=timit",              # manifest-backed corpus
        f"data.data_dir={data_dir}",
        f"train.total_steps={args.student_steps}",
        f"train.eval_every={args.student_steps}",
        f"train.ckpt_every={args.student_steps}",
        "train.seed=7",
    ])
    student = Solver(scfg, wd / "student", use_mesh=False)
    student.train()
    s_per, _, _ = student._score_batches(
        student.bundle.dev, student.eval_params(require_ckpt=True), "beam"
    )
    print(f"# student dev PER {s_per:.3f}", file=sys.stderr)

    print(json.dumps({
        "teacher_dev_per": round(t_per, 4),
        "student_dev_per": round(s_per, 4),
        "pseudo_kept": stats["kept"],
        "unlabeled": args.unlabeled,
        "student_improves": s_per < t_per,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
