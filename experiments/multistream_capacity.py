"""Multi-stream serving capacity: streams sustainable at RTF < 1.

Drives decode.streaming.MultiStreamTranscriber with S concurrent
synthetic streams for S in a doubling sweep and measures the wall time
of one pump round (one jit chunk call stepping all S streams).  A round
advances every stream by chunk_frames feature frames =
chunk_frames * hop / sr seconds of audio, so the chip sustains S
streams in real time iff round_wall < chunk_audio_seconds — capacity is
the largest S in the sweep that satisfies it (with per-S RTF printed so
the headroom curve is visible).

The premise being tested: a single stream's chunk is dispatch-bound
(experiments/README.md — wall time flat in chunk size), so stepping S
streams together should cost ~the same wall time as one until the
compute actually saturates, scaling capacity ~S x over the
one-stream-per-chip baseline.

Usage:
    python experiments/multistream_capacity.py
        [--config configs/ls100_conformer_streaming.yaml]
        [--max-streams 256] [--beam 1] [--rounds 30] [--platform cpu]

Prints one JSON line per S, then a summary line with the capacity.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config",
                   default="configs/ls100_conformer_streaming.yaml")
    p.add_argument("--max-streams", type=int, default=256)
    p.add_argument("--streams", default=None,
                   help="comma list of S values (e.g. 256,320,384,448,"
                        "512) overriding the doubling sweep — the knee "
                        "region needs finer than 2x steps (VERDICT r4 "
                        "next #5: publish MEASURED knees, all points "
                        "from one harness version)")
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--rounds", type=int, default=30)
    p.add_argument("--max-u", type=int, default=256)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args, overrides = p.parse_known_args()

    import jax

    if args.platform and args.platform != "tpu":
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.decode.streaming import (
        MultiStreamTranscriber,
    )
    from semi_supervised_asr_tpu.models import seq2seq as M

    cfg = load_config(args.config, overrides)
    params = M.init_model(jax.random.PRNGKey(0), cfg.model)
    n_mels = cfg.model.n_mels
    cmvn = (np.zeros(n_mels, np.float32), np.ones(n_mels, np.float32))
    hop, sr = cfg.frontend.hop_length, cfg.frontend.sample_rate
    rng = np.random.default_rng(0)

    capacity, results = 0, []
    if args.streams:
        schedule = [int(x) for x in args.streams.split(",")]
    else:
        schedule = [2 ** i for i in range(args.max_streams.bit_length())
                    if 2 ** i <= args.max_streams]
    for s in schedule:
        ms = MultiStreamTranscriber(
            params, cfg, cmvn, max_u=args.max_u, n_streams=s,
            beam_size=args.beam,
        )
        chunk_audio_s = ms.chunk_frames * hop / sr
        consumed = ms.chunk_frames * hop
        sids = [ms.open() for _ in range(s)]
        feed = (rng.standard_normal(
            (s, ms._chunk_samples + consumed)
        ) * 0.1).astype(np.float32)
        # warmup: compile + first rounds
        for sid in sids:
            ms.feed(sid, feed[sid])
        ms.pump()
        jax.block_until_ready(jax.tree.leaves(ms._state)[0])
        walls = []
        zero_round_pumps = 0
        for _ in range(args.rounds):
            for sid in sids:
                ms.feed(sid, feed[sid][:consumed])
            t0 = time.perf_counter()
            rounds = ms.pump()
            jax.block_until_ready(jax.tree.leaves(ms._state)[0])
            if rounds < 1:
                # a pump that stepped nothing measures dispatch of a
                # no-op, not decode — recording it produced an
                # impossible 0.015 RTF at S=256 in the r4 sweep
                # (superseded by a direct fenced re-measurement)
                zero_round_pumps += 1
                continue
            walls.append((time.perf_counter() - t0) / rounds)
        if zero_round_pumps:
            print(json.dumps({
                "streams": s, "invalid": True,
                "zero_round_pumps": zero_round_pumps,
                "note": "pump() executed 0 full rounds — feed "
                        "accounting starved the chunk buffer; point "
                        "dropped, not a capacity datum",
            }), flush=True)
        if not walls:
            continue
        med = float(np.median(walls))
        p99 = float(np.quantile(walls, 0.99))
        rtf = med / chunk_audio_s
        rec = {
            "streams": s, "round_ms": round(med * 1e3, 2),
            "round_p99_ms": round(p99 * 1e3, 2),
            "chunk_audio_ms": round(chunk_audio_s * 1e3, 1),
            "rtf": round(rtf, 4), "beam": args.beam,
            "realtime": rtf < 1.0,
        }
        print(json.dumps(rec), flush=True)
        results.append(rec)
        if rtf < 1.0:
            capacity = max(capacity, s)
        else:
            break                       # past the knee; stop the sweep

    print(json.dumps({
        "config": args.config, "beam": args.beam,
        "capacity_streams_rtf_lt_1": capacity,
        "sweep": [(r["streams"], r["rtf"]) for r in results],
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
