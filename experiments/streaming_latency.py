"""Streaming inference latency: per-chunk wall time and real-time factor.

Drives decode.streaming.StreamingTranscriber on synthetic audio with the
ls100_transducer_streaming recipe shape (or --config) and measures the
steady-state per-chunk latency — the number that matters for live ASR:
a chunk of C feature frames covers C*hop/16k seconds of audio, so
RTF = chunk_wall_seconds / chunk_audio_seconds (<< 1 means the decoder
keeps up).  Prints one JSON line.

Usage:
    python experiments/streaming_latency.py [--config configs/....yaml]
        [--chunk-frames 8] [--seconds 20] [--platform cpu]
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
                   default="configs/ls100_transducer_streaming.yaml")
    p.add_argument("--chunk-frames", type=int, default=8)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    args, overrides = p.parse_known_args()

    import jax

    if args.platform and args.platform != "tpu":
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.decode.streaming import (
        StreamingTranscriber,
    )
    from semi_supervised_asr_tpu.models import seq2seq as M

    cfg = load_config(args.config, overrides)
    params = M.init_model(jax.random.PRNGKey(0), cfg.model)
    n_mels = cfg.model.n_mels
    cmvn = (np.zeros(n_mels, np.float32), np.ones(n_mels, np.float32))
    hop = cfg.frontend.hop_length
    sr = cfg.frontend.sample_rate
    chunk = args.chunk_frames
    st = StreamingTranscriber(params, cfg, cmvn, max_u=256,
                              chunk_frames=chunk)

    rng = np.random.default_rng(0)
    chunk_samples = chunk * hop
    n_chunks = max(int(args.seconds * sr / chunk_samples), 12)
    audio = (rng.standard_normal(chunk_samples * n_chunks + 400)
             * 0.1).astype(np.float32)

    # warmup: first feeds pay the two jit compiles
    st.feed(audio[: chunk_samples * 3])
    _ = st.tokens     # forces device sync

    times = []
    pos = chunk_samples * 3
    for i in range(n_chunks - 4):
        t0 = time.perf_counter()
        st.feed(audio[pos: pos + chunk_samples])
        jax.block_until_ready(st._dec_carry[4])
        times.append(time.perf_counter() - t0)
        pos += chunk_samples
    st.finalize()

    times = np.asarray(times[1:])
    chunk_audio_s = chunk_samples / sr
    med = float(np.median(times))
    out = {
        "metric": "streaming_chunk_latency",
        "backend": jax.default_backend(),
        "chunk_frames": chunk,
        "chunk_audio_ms": chunk_audio_s * 1e3,
        "median_chunk_ms": med * 1e3,
        "p99_chunk_ms": float(np.percentile(times, 99)) * 1e3,
        "rtf": med / chunk_audio_s,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
