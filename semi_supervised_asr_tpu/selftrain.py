"""Offline self-training round (noisy student / iterative pseudo-labeling).

    python -m semi_supervised_asr_tpu.selftrain --config configs/x.yaml \
        --load-dir runs/teacher --manifest data/unlabeled.jsonl \
        --out data/pseudo.jsonl [--beam 5] [--min-score -1.0] \
        [--keep-frac 0.8] [--union data/labeled.jsonl]

The OFFLINE counterpart of the in-step pseudo-label consistency term
(objectives/losses.pseudo_label_loss): a trained teacher checkpoint
decodes an UNLABELED manifest and writes a pseudo-LABELED manifest in the
training schema ({"uid", "audio", "n_samples", "text"}, data/corpus.py),
plus a "pseudo_score" field (the beam's length-normalized logprob).  Point
``data.train_manifest`` at the output (or at ``--union`` = labeled ∪
filtered pseudo) and train the next student — the standard iterative
self-training loop for LibriSpeech (Noisy Student, Park et al. 2020;
composes with SpecAugment, which the train step applies anyway).

Filtering (both optional, composable):
* ``--min-score``: drop utterances whose normalized logprob is below an
  absolute threshold;
* ``--keep-frac``: keep only the top fraction by score (confidence
  quantile) of what remains.
Empty-text hypotheses are always dropped.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def read_manifest(path: str | Path) -> list[dict]:
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def pseudo_label_entries(
    solver,
    entries: list[dict],
    manifest_root: Path,
    mode: str = "beam",
    min_score: float | None = None,
    keep_frac: float | None = None,
) -> tuple[list[dict], dict]:
    """Decode the entries' audio with the teacher -> (pseudo entries, stats).

    Output entries keep uid/audio/n_samples and carry the hypothesis as
    "text" plus "pseudo_score"; input "text" (if any) is ignored — this is
    the unlabeled stream.
    """
    from semi_supervised_asr_tpu.transcribe import transcribe

    paths = []
    for e in entries:
        p = Path(e["audio"])
        paths.append(p if p.is_absolute() else manifest_root / p)
    results = transcribe(solver, paths, mode)

    labeled = []
    for e, path, r in zip(entries, paths, results):
        if not r["text"]:
            continue
        labeled.append({
            "uid": e["uid"],
            "audio": str(path),
            "n_samples": e["n_samples"],
            "text": r["text"],
            "pseudo_score": r["score"],
        })
    n_decoded = len(labeled)

    if min_score is not None:
        labeled = [e for e in labeled if e["pseudo_score"] >= min_score]
    n_above = len(labeled)
    if keep_frac is not None and labeled:
        assert 0.0 < keep_frac <= 1.0, keep_frac
        labeled.sort(key=lambda e: e["pseudo_score"], reverse=True)
        labeled = labeled[: max(1, int(round(keep_frac * len(labeled))))]
        labeled.sort(key=lambda e: e["uid"])  # deterministic output order

    stats = {
        "total": len(entries),
        "decoded_nonempty": n_decoded,
        "after_min_score": n_above,
        "kept": len(labeled),
    }
    return labeled, stats


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="semi_supervised_asr_tpu.selftrain")
    p.add_argument("--config", required=True)
    p.add_argument("--load-dir", required=True,
                   help="teacher workdir (checkpoint + cmvn.npz)")
    p.add_argument("--manifest", required=True,
                   help="unlabeled jsonl manifest (audio paths + lengths)")
    p.add_argument("--out", required=True,
                   help="pseudo-labeled manifest to write")
    p.add_argument("--beam", type=int, default=None,
                   help="beam size; 1 = greedy, 0 = CTC greedy")
    p.add_argument("--min-score", type=float, default=None,
                   help="drop hyps below this normalized logprob")
    p.add_argument("--keep-frac", type=float, default=None,
                   help="keep only this top fraction by confidence")
    p.add_argument("--union", default=None,
                   help="also copy this labeled manifest into --out "
                        "(labeled ∪ pseudo, ready for data.train_manifest)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args, overrides = p.parse_known_args(argv)

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend: under the
        # axon plugin the chip registers programmatically and
        # jax_platforms="tpu" would probe a native TPU and fail

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.training.solver import Solver

    cfg = load_config(args.config, overrides)
    if args.beam is not None and args.beam > 1:
        import dataclasses

        cfg = cfg.replace(decode=dataclasses.replace(
            cfg.decode, beam_size=args.beam))
    mode = {0: "ctc", 1: "greedy"}.get(args.beam, "beam")

    entries = read_manifest(args.manifest)
    solver = Solver(cfg, args.load_dir, use_mesh=False)
    labeled, stats = pseudo_label_entries(
        solver, entries, Path(args.manifest).parent, mode,
        args.min_score, args.keep_frac,
    )

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        if args.union:
            for e in read_manifest(args.union):
                f.write(json.dumps(e) + "\n")
        for e in labeled:
            f.write(json.dumps(e) + "\n")
    print(json.dumps({"out": str(out), **stats,
                      "union": bool(args.union)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
