"""Benchmark: fused train-step throughput on the attached TPU chip.

Measures the flagship metric (BASELINE.json:5): audio frames/sec/chip
through the FULL fused train step — on-device frontend (STFT->mel->log->
CMVN->SpecAugment) + pBLSTM listener + attention speller + masked CE +
grad + Adam update — on a TIMIT-flagship-shaped model.

Prints ONE JSON line:
  {"metric": "train_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s/chip", "vs_baseline": N / 20000}
(baseline = the >=20k frames/s/chip north-star target; no reference
numbers exist — BASELINE.md.)
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--frames", type=int, default=400)   # 4s utterances
    p.add_argument("--tokens", type=int, default=48)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--platform", default=None)
    p.add_argument("--mode", default="train", choices=["train", "decode"],
                   help="train: fused train step; decode: jit beam search "
                        "(beam=5, cached encoder states)")
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--lstm-backend", default="pallas",
                   choices=["xla", "pallas"],
                   help="encoder LSTM execution: Pallas scan kernel "
                        "(default; 1.55x faster full step: 25.5ms vs "
                        "39.6ms at b128/T400) or XLA lax.scan")
    p.add_argument("--fft-backend", default="matmul",
                   choices=["xla", "matmul"],
                   help="frontend DFT: fp32 MXU matmul (default; 12% "
                        "faster full step, matches rfft to ~4e-5) or "
                        "XLA rfft (VPU-bound)")
    p.add_argument("--conv-subsample", type=int, default=0,
                   help="stride-2 conv stem blocks before the LSTMs "
                        "(each halves the scan length; changes the model)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from semi_supervised_asr_tpu.config import (
        Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
    )
    from semi_supervised_asr_tpu.training import train_step as TS

    cfg = Config(
        frontend=FrontendConfig(spec_augment=True, cmvn="global",
                                fft_backend=args.fft_backend),
        model=ModelConfig(
            n_mels=80, vocab_size=65, enc_hidden=256, enc_layers=3,
            enc_base_layers=1, attn_dim=128, attn_conv_channels=10,
            attn_conv_width=100, dec_hidden=512, dec_layers=1,
            embed_dim=256, compute_dtype="bfloat16",
            lstm_backend=args.lstm_backend,
            conv_subsample=args.conv_subsample,
        ),
        objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
        train=TrainConfig(learning_rate=1e-3),
    )

    rng = np.random.default_rng(0)
    b, f, u = args.batch, args.frames, args.tokens
    tr = cfg.model.time_reduction
    f = ((f + tr - 1) // tr) * tr   # bucket rule: divisible by reduction
    s = (f - 1) * cfg.frontend.hop_length
    audio = (rng.standard_normal((b, s)) * 0.1).astype(np.float32)
    audio_lens = np.full((b,), s, np.int32)
    tokens = np.zeros((b, u), np.int32)
    tokens[:, : u - 1] = rng.integers(4, 65, (b, u - 1))
    tokens[:, u - 1] = 2
    real = np.ones((b,), bool)
    cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))

    if args.mode == "train":
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg)
        dev_args = [jax.device_put(x) for x in
                    (audio, audio_lens, tokens, real, *cmvn)]

        for _ in range(args.warmup):
            state, m = step(state, *dev_args)
        _ = float(m["loss"])  # host fetch forces completion
        # (block_until_ready proved unreliable through the axon tunnel)

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, *dev_args)
        _ = float(m["loss"])  # fetch-at-end: steps pipeline, transfer fences
        dt = time.perf_counter() - t0
        tail = f"loss={float(m['loss']):.3f}"
        metric = "train_frames_per_sec_per_chip"
    else:
        import dataclasses

        import jax.numpy as jnp

        from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
        from semi_supervised_asr_tpu.models import seq2seq as MM
        from semi_supervised_asr_tpu.training.train_step import featurize

        cfg = cfg.replace(
            decode=dataclasses.replace(cfg.decode, beam_size=args.beam)
        )
        params = MM.init_model(jax.random.PRNGKey(0), cfg.model)

        @jax.jit
        def decode_fn(params, audio, audio_lens, cmvn_mean, cmvn_std):
            feats, flens = featurize(
                cfg, audio, audio_lens, (cmvn_mean, cmvn_std), None, False
            )
            enc, enc_mask, keys = MM.encode(params, feats, flens, cfg.model)
            return beam_decode_from_enc(
                params["speller"], cfg.model, cfg.decode,
                enc, enc_mask, keys, u,
            )

        dev_args = [jax.device_put(x) for x in (audio, audio_lens, *cmvn)]
        for _ in range(args.warmup):
            hyps, scores = decode_fn(params, *dev_args)
        _ = np.asarray(scores)

        t0 = time.perf_counter()
        for _ in range(args.steps):
            hyps, scores = decode_fn(params, *dev_args)
        _ = np.asarray(scores)
        dt = time.perf_counter() - t0
        tail = f"beam={args.beam}"
        metric = "decode_frames_per_sec_per_chip"

    frames_total = b * f * args.steps  # 10ms audio frames consumed
    fps = frames_total / dt
    result = {
        "metric": metric,
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 20000.0, 4),
    }
    print(json.dumps(result))
    print(
        f"# device={jax.devices()[0]} step_time={dt/args.steps*1000:.1f}ms "
        f"batch={b} frames={f} {tail}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
