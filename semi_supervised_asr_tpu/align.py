"""Forced alignment CLI: known transcripts -> per-token timestamps.

    python -m semi_supervised_asr_tpu.align --config configs/x.yaml \
        --load-dir runs/x --manifest data/train.jsonl --out aligned.jsonl \
        [--platform cpu] [overrides ...]

The corpus-tooling counterpart of ``transcribe --timestamps``: instead
of timing a decoded hypothesis, align each manifest entry's REFERENCE
text ({"uid", "audio", "text"}, the training schema) against the CTC
head's frame posteriors with Viterbi forced alignment
(ops/ctc_align.py) — the classic Kaldi/ctc-segmentation workflow for
building time-marked corpora, caption tracks, or keyword indexes from
transcribed audio.  Works with the ctc family and any LAS config
trained with the joint-CTC head (objective.lambda_ctc > 0); the
transducer has no frame posterior and is rejected.

Output: one JSON object per entry —
``{"uid", "audio", "text", "logp_per_frame", "tokens": [{"t",
"start_s", "end_s"}]}``.  Entries whose text cannot be realized as a
CTC path within their frames (audio shorter than the transcript
demands) or whose audio exceeds the largest frame bucket (forced
alignment is a single global DP — no chunk stitching) are written with
``"failed": reason`` and no tokens; the exit code stays 0 unless ALL
entries fail.

Batching mirrors training: utterances group by (frame bucket, token
bucket) so jit compiles once per grid cell, not per shape.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def align_entries(solver, entries: list[dict],
                  manifest_root: Path) -> list[dict]:
    """Forced-align manifest entries -> records (see module docstring)."""
    import jax.numpy as jnp

    from semi_supervised_asr_tpu.data.corpus import load_audio
    from semi_supervised_asr_tpu.data.vocab import PAD
    from semi_supervised_asr_tpu.ops.frontend_oracle import pad_for_batch

    cfg = solver.cfg
    fn = solver._align_fn()
    params = solver.eval_params(require_ckpt=True)
    spec = solver.spec
    sec_per_frame = (
        cfg.frontend.hop_length * cfg.model.time_reduction
        / cfg.frontend.sample_rate
    )
    token_buckets = cfg.data.token_buckets

    # load + encode + bucket (grid batching: one compile per cell)
    by_cell: dict[tuple[int, int], list[tuple[int, np.ndarray, list[int]]]]
    by_cell = {}
    records: list[dict | None] = [None] * len(entries)
    for i, e in enumerate(entries):
        p = Path(e["audio"])
        p = p if p.is_absolute() else manifest_root / p
        audio = np.asarray(load_audio(p), np.float32)
        ids = solver.vocab.encode_text(e["text"])
        rec = {"uid": e.get("uid", str(p)), "audio": str(p),
               "text": e["text"]}
        records[i] = rec
        fb = spec.frame_bucket(spec.frames_for_samples(len(audio)))
        tb = next((t for t in token_buckets if t >= len(ids)), None)
        if fb is None:
            rec["failed"] = "audio exceeds the largest frame bucket"
            continue
        if tb is None or not ids:
            rec["failed"] = ("empty transcript" if not ids else
                             "transcript exceeds the largest token bucket")
            continue
        by_cell.setdefault((fb, tb), []).append((i, audio, ids))

    batch_size = cfg.train.batch_size
    for (fb, tb), items in sorted(by_cell.items()):
        s_len = spec.samples_for_frames(fb)
        for start in range(0, len(items), batch_size):
            chunk = items[start: start + batch_size]
            n = len(chunk)
            audio = np.zeros((batch_size, s_len), np.float32)
            lens = np.zeros((batch_size,), np.int32)
            toks = np.full((batch_size, tb), PAD, np.int32)
            tlens = np.zeros((batch_size,), np.int32)
            for r, (_, a, ids) in enumerate(chunk):
                m = min(len(a), s_len)
                audio[r] = pad_for_batch(
                    a[:m].astype(np.float32), s_len, cfg.frontend
                )
                lens[r] = m
                toks[r, : len(ids)] = ids
                tlens[r] = len(ids)
            starts, ends, plp = fn(
                params, jnp.asarray(audio), jnp.asarray(lens),
                jnp.asarray(solver.cmvn[0]), jnp.asarray(solver.cmvn[1]),
                jnp.asarray(toks), jnp.asarray(tlens),
            )
            starts, ends = np.asarray(starts), np.asarray(ends)
            plp = np.asarray(plp)
            for r, (i, _, ids) in enumerate(chunk):
                rec = records[i]
                if not np.isfinite(plp[r]):
                    rec["failed"] = ("transcript does not fit the audio "
                                     "as a CTC path")
                    continue
                syms = solver.vocab.decode(ids, strip_specials=False)
                n_frames = max(
                    int(ends[r, : len(ids)].max()) + 1, 1
                )
                rec["logp_per_frame"] = round(float(plp[r]) / n_frames, 4)
                rec["tokens"] = [
                    {"t": syms[j],
                     "start_s": round(
                         float(starts[r, j]) * sec_per_frame, 3),
                     "end_s": round(
                         (float(ends[r, j]) + 1) * sec_per_frame, 3)}
                    for j in range(len(ids))
                ]
    return records


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="semi_supervised_asr_tpu.align")
    p.add_argument("--config", required=True)
    p.add_argument("--load-dir", required=True,
                   help="training workdir (checkpoint + cmvn.npz)")
    p.add_argument("--manifest", required=True,
                   help="labeled manifest jsonl ({uid, audio, text})")
    p.add_argument("--out", default=None, help="write jsonl here too")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args, overrides = p.parse_known_args(argv)

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend (axon registers itself)

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.selftrain import read_manifest
    from semi_supervised_asr_tpu.training.solver import Solver

    cfg = load_config(args.config, overrides)
    solver = Solver(cfg, args.load_dir, use_mesh=False)
    entries = read_manifest(args.manifest)
    if not entries:
        raise SystemExit(f"empty manifest: {args.manifest}")
    records = align_entries(solver, entries,
                            Path(args.manifest).resolve().parent)
    out_f = open(args.out, "w") if args.out else None
    n_fail = 0
    for rec in records:
        n_fail += "failed" in rec
        line = json.dumps(rec)
        print(line)
        if out_f:
            out_f.write(line + "\n")
    if out_f:
        out_f.close()
    if n_fail:
        print(f"WARNING: {n_fail}/{len(records)} entries failed to align",
              file=sys.stderr)
    return 0 if n_fail < len(records) else 1


if __name__ == "__main__":
    sys.exit(main())
