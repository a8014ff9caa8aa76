"""Benchmark: fused train-step throughput on the attached TPU chip.

Measures the flagship metric (BASELINE.json:5): audio frames/sec/chip
through the FULL fused train step — on-device frontend (STFT->mel->log->
CMVN->SpecAugment) + pBLSTM listener + attention speller + masked CE +
grad + Adam update — on a TIMIT-flagship-shaped model.

Four measurements in ONE JSON line (the driver contract's primary
metric stays ``value``):

* ``value``: device-only steady state (one device-resident batch re-fed
  — input pipeline excluded, the pure compute ceiling);
* ``sustained``: pipeline-INCLUSIVE frames/s — batches stream from a
  generated ON-DISK WAV corpus through the real bucketed pipeline with
  grain read-ahead threads (host decode + assembly + H2D in the loop)
  for >= --sustained-secs of wall clock (VERDICT r1 missing #4);
* ``mfu``: analytic model-matmul FLOPs/step over step time and the
  chip's peak (VERDICT r1 missing #3).  The model is a latency-bound
  RNN: per-step MXU work is microseconds against a serial h->h
  dependency chain, so single-digit-percent MFU is the architecture's
  roofline, not an inefficiency — DESIGN.md quantifies this.
* ``decode_frames_per_sec_per_chip``: the OTHER half of the target
  metric ("train + decode", BASELINE.json:5) — the batched jit beam
  (beam=5, cached encoder states) on the same flagship shape, merged
  into the same line so the driver's no-arg run records both
  (VERDICT r2 missing #4).  ``--mode decode`` still emits a
  decode-primary line for standalone use; ``--decode-steps 0`` skips
  the merged measurement.

``vs_baseline`` divides by the 20k frames/s/chip TARGET from
BASELINE.json:5 — no measured reference numbers exist (BASELINE.md
``published: {}``), so it is target-relative, not reference-relative.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


# Peak dense-matmul FLOP/s by device kind (bf16 MXU; public spec sheets).
# The attached chip reports "TPU v5 lite" (v5e: 197 TFLOP/s bf16).
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,
}


def analytic_flops_per_step(cfg, b: int, frames: int, u: int) -> float:
    """Model matmul FLOPs for ONE train step (fwd + bwd ~= 3x fwd).

    Counts the MXU-shaped work only (DFT/mel matmuls, LSTM gate matmuls,
    attention projections/contractions, output projection); elementwise
    VPU work is excluded — on TPU it hides behind the matmuls or is
    bandwidth-bound, and MFU conventionally counts matmul FLOPs.
    """
    m = cfg.model
    f = cfg.frontend
    t = frames
    # frontend: real-DFT as two matmuls [win -> n_fft/2+1] + mel matmul.
    # Forward-only (no parameters upstream of it -> no backward pass).
    n_bins = f.n_fft // 2 + 1
    fl_front = 0.0
    if f.fft_backend == "matmul":
        fl_front += 2 * b * t * f.win_length * n_bins * 2
    fl_front += 2 * b * t * n_bins * f.n_mels
    fl = 0.0
    # conv stem: stride-2 3x3 blocks over (time, freq)
    ti, fi, ci = t, f.n_mels, 1
    for _ in range(m.conv_subsample):
        ti, fi = (ti + 1) // 2, (fi + 1) // 2
        fl += 2 * b * ti * fi * 9 * ci * m.conv_channels
        ci = m.conv_channels
    h = m.enc_hidden
    in_dim = fi * ci if m.conv_subsample else f.n_mels
    if m.encoder_arch in ("transformer", "conformer"):
        # input proj + per block: QKVO projections, score/context
        # contractions, FFN (models/transformer_listener.py)
        d = 2 * h
        fl += 2 * b * ti * in_dim * d
        n_ff = 1 if m.encoder_arch == "transformer" else 2  # macaron
        per_blk = (
            4 * 2 * b * ti * d * d          # q,k,v,o projections
            + 2 * 2 * b * ti * ti * d       # scores + context
            + n_ff * 2 * 2 * b * ti * d * m.enc_ff_dim   # FFN(s)
        )
        if m.encoder_arch == "conformer":
            per_blk += (
                2 * b * ti * d * 2 * d      # pointwise d->2d
                + 2 * b * ti * m.conformer_conv_width * d  # depthwise
                + 2 * b * ti * d * d        # pointwise d->d
            )
        fl += m.enc_blocks * per_blk
    else:
        # (Bi)LSTM stack: per direction 2*T*B*(I*4H + H*4H); streaming
        # configs (enc_bidirectional=false) run one direction
        ndir = 2 if m.enc_bidirectional else 1
        for _ in range(m.enc_base_layers):
            fl += ndir * 2 * ti * b * (in_dim * 4 * h + h * 4 * h)
            in_dim = ndir * h
        for _ in range(m.enc_layers):
            ti //= 2
            fl += ndir * 2 * ti * b * (2 * in_dim * 4 * h + h * 4 * h)
            in_dim = ndir * h
    t_enc = ti
    e_out = m.enc_out_dim
    if m.family == "transducer":
        # predictor LSTM over U+1 + the [T', U+1] joint grid
        u1 = u + 1
        pin = m.embed_dim
        for _ in range(m.pred_layers):
            fl += 2 * u1 * b * (pin * 4 * m.pred_hidden
                                + m.pred_hidden * 4 * m.pred_hidden)
            pin = m.pred_hidden
        fl += 2 * b * t_enc * e_out * m.joint_dim          # enc proj
        fl += 2 * b * u1 * m.pred_hidden * m.joint_dim     # pred proj
        fl += 2 * b * t_enc * u1 * m.joint_dim * m.vocab_size  # grid out
        return fl_front + 3.0 * fl
    if m.family == "ctc":
        # encoder-only: one linear head past the listener
        fl += 2 * b * t_enc * e_out * m.vocab_size
        return fl_front + 3.0 * fl
    if m.decoder_arch == "transformer":
        # transformer speller (models/transformer_speller.py): one parallel
        # causal pass over all U positions; the [U,U]/[U,T'] score grids
        # are computed dense then masked (count them dense, like the
        # listener's)
        d = m.dec_hidden
        per_blk = (
            4 * 2 * b * u * d * d                  # self-attn q,k,v,o
            + 2 * 2 * b * u * u * d                # self scores + context
            + 2 * 2 * b * u * d * d                # cross q,o
            + 2 * 2 * b * t_enc * e_out * d        # cross k,v (from enc)
            + 2 * 2 * b * u * t_enc * d            # cross scores + context
            + 2 * 2 * b * u * d * m.dec_ff_dim     # FFN
        )
        fl += m.dec_blocks * per_blk
        fl += 2 * b * u * d * m.vocab_size         # output projection
        return fl_front + 3.0 * fl
    # attention: key projection once; per decode step query/energy/context
    fl += 2 * b * t_enc * e_out * m.attn_dim
    per_step = (
        2 * b * m.dec_hidden * m.attn_dim            # query proj
        + 2 * b * t_enc * m.attn_conv_width * m.attn_conv_channels
        + 2 * b * t_enc * m.attn_conv_channels * m.attn_dim
        + 2 * b * t_enc * m.attn_dim                 # energies (v·tanh)
        + 2 * b * t_enc * e_out                      # context
    )
    # speller LSTM + output projection
    dh = m.dec_hidden
    dec_in = m.embed_dim + e_out
    for layer in range(m.dec_layers):
        per_step += 2 * b * (dec_in * 4 * dh + dh * 4 * dh)
        dec_in = dh
    per_step += 2 * b * dh * m.vocab_size
    fl += u * per_step
    return fl_front + 3.0 * fl     # backward ~= 2x forward (model only)


def _gen_wav_corpus(root, n_utts: int, frames: int, u: int, hop: int,
                    vocab_size: int = 65):
    """TIMIT-shaped on-disk corpus: 16-bit WAV files + jsonl manifest, so
    the sustained bench pays real audio decode + batch assembly."""
    from pathlib import Path

    from scipy.io import wavfile

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    s = (frames - 1) * hop
    entries = []
    for i in range(n_utts):
        wav = (rng.standard_normal(s) * 3000.0).astype(np.int16)
        name = f"utt{i:04d}.wav"
        wavfile.write(root / name, 16000, wav)
        toks = rng.integers(4, vocab_size, u - 1).tolist() + [2]
        entries.append({"uid": f"utt{i:04d}", "audio": name,
                        "n_samples": s, "tokens": toks})
    mpath = root / "manifest.jsonl"
    with open(mpath, "w") as fh:
        for e in entries:
            fh.write(json.dumps(e) + "\n")
    return mpath


def _measure_decode(cfg, beam: int, warmup: int, steps: int,
                    audio, audio_lens, cmvn, u: int):
    """Batched jit beam decode (cached encoder states) on the flagship
    shape: frames/s/chip + step ms.  Shared by ``--mode decode`` and the
    merged train-mode measurement."""
    import dataclasses

    import jax

    from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
    from semi_supervised_asr_tpu.models import seq2seq as MM
    from semi_supervised_asr_tpu.training.train_step import featurize

    cfg = cfg.replace(
        decode=dataclasses.replace(cfg.decode, beam_size=beam)
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
    for _ in range(warmup):
        hyps, scores = decode_fn(params, *dev_args)
    _ = np.asarray(scores)

    t0 = time.perf_counter()
    for _ in range(steps):
        hyps, scores = decode_fn(params, *dev_args)
    _ = np.asarray(scores)
    dt = time.perf_counter() - t0
    return dt


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
    p.add_argument("--decode-steps", type=int, default=20,
                   help="train mode: ALSO time the jit beam decode for "
                        "this many steps and merge "
                        "decode_frames_per_sec_per_chip into the JSON "
                        "line (the target metric is train + decode); "
                        "0 disables")
    p.add_argument("--lstm-backend", default="pallas",
                   choices=["xla", "pallas"],
                   help="encoder LSTM execution: Pallas scan kernel "
                        "(default; 1.55x faster full step: 25.5ms vs "
                        "39.6ms at b128/T400) or XLA lax.scan")
    p.add_argument("--fft-backend", default="matmul",
                   choices=["xla", "matmul"],
                   help="frontend DFT: fp32 MXU matmul (default; 12%% "
                        "faster full step, matches rfft to ~4e-5) or "
                        "XLA rfft (VPU-bound)")
    p.add_argument("--conv-subsample", type=int, default=0,
                   help="stride-2 conv stem blocks before the LSTMs "
                        "(each halves the scan length; changes the model)")
    p.add_argument("--encoder", default="blstm",
                   choices=["blstm", "transformer", "conformer"],
                   help="listener architecture: pBLSTM (reference parity) "
                        "or conv-subsampled self-attention encoder "
                        "(MXU-dense, no serial scan; implies 2 conv "
                        "blocks unless --conv-subsample set)")
    p.add_argument("--enc-blocks", type=int, default=12,
                   help="transformer encoder: number of blocks")
    p.add_argument("--enc-ff", type=int, default=2048,
                   help="transformer encoder: FFN width")
    p.add_argument("--bf16-stream", action="store_true",
                   help="train.bf16_weight_stream: one-time bf16 weight "
                        "cast inside the loss (halves scan weight traffic)")
    p.add_argument("--speller-grad", default="scan",
                   choices=["scan", "stacked"],
                   help="model.speller_grad: 'stacked' reroutes the "
                        "decoder dW/d(enc) accumulators to post-hoc MXU "
                        "contractions (models/speller.py)")
    p.add_argument("--config", default=None,
                   help="bench a shipped recipe: take model+frontend (and "
                        "remat) from this YAML instead of the flagship "
                        "bench shape; --batch/--frames/--tokens still "
                        "set the data shape")
    p.add_argument("--override", action="append", default=[],
                   help="with --config: section.key=value recipe "
                        "overrides (repeatable), e.g. "
                        "model.speller_grad=scan for perf A/Bs")
    p.add_argument("--sustained-secs", type=float, default=24.0,
                   help="train mode: ALSO measure pipeline-inclusive "
                        "throughput by streaming an on-disk WAV corpus "
                        "through the real bucketed pipeline (grain "
                        "read-ahead) for this long IN TOTAL, split into "
                        "--sustained-rounds fenced rounds whose median "
                        "is reported; 0 disables")
    p.add_argument("--sustained-rounds", type=int, default=3,
                   help="fenced measurement rounds for the sustained "
                        "phase (median + spread in the JSON; VERDICT "
                        "r4 weak #3)")
    p.add_argument("--corpus-utts", type=int, default=256,
                   help="utterances in the generated sustained corpus")
    p.add_argument("--grain-threads", type=int, default=4)
    p.add_argument("--device-timeout", type=float, default=600.0,
                   help="seconds to wait for the default (TPU) backend to "
                        "come up before falling back to CPU — a dead "
                        "tunnel must produce a labeled CPU number, not a "
                        "hang; 0 disables the probe")
    args = p.parse_args()

    platform_fallback = os.environ.get("SSASR_BENCH_CPU_FALLBACK") or None
    if args.platform and args.platform != "tpu":
        import jax

        jax.config.update("jax_platforms", args.platform)
    elif args.device_timeout > 0:
        # The axon TPU plugin blocks indefinitely in device init when its
        # tunnel is unreachable.  Init it in THIS process under a watchdog
        # (zero overhead when healthy — the main run reuses the backend);
        # on timeout, re-exec with the CPU platform forced, which both
        # kills the stuck init thread and labels the JSON via the env.
        import sys
        import threading

        done = threading.Event()

        def _touch():
            import jax

            jax.devices()
            done.set()

        threading.Thread(target=_touch, daemon=True).start()
        if not done.wait(args.device_timeout):
            note = "cpu (default TPU backend unreachable at bench time)"
            print(f"# WARNING: {note} — re-exec on cpu", file=sys.stderr)
            os.environ["SSASR_BENCH_CPU_FALLBACK"] = note
            os.execv(
                sys.executable,
                [sys.executable, sys.argv[0], *sys.argv[1:],
                 "--platform", "cpu"],
            )
    # --platform tpu keeps the DEFAULT backend: under the axon plugin the
    # chip registers programmatically and jax_platforms="tpu" would probe
    # a native TPU and fail (same convention as main.py / experiments)
    import jax

    from semi_supervised_asr_tpu.config import (
        Config, FrontendConfig, ModelConfig, ObjectiveConfig, TrainConfig,
    )
    from semi_supervised_asr_tpu.training import train_step as TS

    if args.config:
        # bench a shipped recipe's model/frontend (and remat) verbatim
        # (vocab pinned to the synthetic 65 so the data below works)
        from semi_supervised_asr_tpu.config import load_config

        rcfg = load_config(
            args.config, ["model.vocab_size=65", *args.override]
        )
        cfg = Config(
            frontend=rcfg.frontend, model=rcfg.model,
            objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
            train=TrainConfig(
                learning_rate=1e-3,
                remat_encoder=rcfg.train.remat_encoder,
                bf16_weight_stream=rcfg.train.bf16_weight_stream,
            ),
        )
    else:
        conv = args.conv_subsample
        if args.encoder in ("transformer", "conformer") and conv == 0:
            conv = 2    # the standard 4x speech-transformer reduction
        cfg = Config(
            frontend=FrontendConfig(spec_augment=True, cmvn="global",
                                    fft_backend=args.fft_backend),
            model=ModelConfig(
                n_mels=80, vocab_size=65, enc_hidden=256, enc_layers=3,
                enc_base_layers=1, attn_dim=128, attn_conv_channels=10,
                attn_conv_width=100, dec_hidden=512, dec_layers=1,
                embed_dim=256, compute_dtype="bfloat16",
                lstm_backend=args.lstm_backend,
                speller_grad=args.speller_grad,
                conv_subsample=conv,
                encoder_arch=args.encoder,
                enc_heads=8, enc_ff_dim=args.enc_ff,
                enc_blocks=args.enc_blocks,
            ),
            objective=ObjectiveConfig(tf_rate_start=1.0, tf_rate_end=1.0),
            train=TrainConfig(learning_rate=1e-3,
                              bf16_weight_stream=args.bf16_stream),
        )

    rng = np.random.default_rng(0)
    b, f, u = args.batch, args.frames, args.tokens
    tr = cfg.model.time_reduction
    f = ((f + tr - 1) // tr) * tr   # bucket rule: divisible by reduction
    s = (f - 1) * cfg.frontend.hop_length
    if not cfg.frontend.center:
        # VALID framing (streaming recipes): a full first window, so the
        # device sees exactly f frames (bucketing.BucketSpec contract)
        s += cfg.frontend.n_fft
    audio = (rng.standard_normal((b, s)) * 0.1).astype(np.float32)
    audio_lens = np.full((b,), s, np.int32)
    tokens = np.zeros((b, u), np.int32)
    tokens[:, : u - 1] = rng.integers(4, 65, (b, u - 1))
    tokens[:, u - 1] = 2
    real = np.ones((b,), bool)
    cmvn = (np.zeros(80, np.float32), np.ones(80, np.float32))

    # host-load sample BEFORE any bench work: the 1-min average still
    # reflects the pre-bench minute, i.e. whether another process was
    # already busy on this (single-core) host
    try:
        load1_start = float(open("/proc/loadavg").read().split()[0])
    except OSError:
        load1_start = None

    if args.mode == "train":
        state = TS.init_train_state(cfg, jax.random.PRNGKey(0))
        step = TS.make_train_step(cfg)
        dev_args = [jax.device_put(x) for x in
                    (audio, audio_lens, tokens, real, *cmvn)]

        for _ in range(args.warmup):
            state, m = step(state, *dev_args)
        _ = float(m["loss"])  # host fetch forces completion
        # (block_until_ready proved unreliable through the axon tunnel)

        # Timed in two fenced halves: a contended chip/host shows up as
        # step-time drift between halves (plus the loadavg probe below),
        # so a contended run can never silently become the number of
        # record — BENCH_r03 recorded 767k frames/s on a machine whose
        # real capability was 2.2M because two soak trainers shared the
        # chip with the driver's bench (VERDICT r3 weak #4).
        # steps actually run is h1+h2 (== args.steps except --steps 1,
        # where both halves clamp to 1 step — dividing by args.steps
        # would then halve the reported throughput; advisor r4 low)
        h1 = max(args.steps // 2, 1)
        h2 = max(args.steps - h1, 1)
        steps_run = h1 + h2
        t0 = time.perf_counter()
        for _ in range(h1):
            state, m = step(state, *dev_args)
        _ = float(m["loss"])  # fetch-at-end: steps pipeline, transfer fences
        t1 = time.perf_counter()
        for _ in range(h2):
            state, m = step(state, *dev_args)
        _ = float(m["loss"])
        t2 = time.perf_counter()
        dt = t2 - t0
        half_ms = ((t1 - t0) / h1 * 1000, (t2 - t1) / h2 * 1000)
        tail = f"loss={float(m['loss']):.3f}"
        metric = "train_frames_per_sec_per_chip"

        # MFU: analytic matmul FLOPs over measured step time and the
        # chip's peak (None off-TPU / unknown kinds)
        step_time = dt / steps_run
        flops_step = analytic_flops_per_step(cfg, b, f, u)
        kind = jax.devices()[0].device_kind
        peak = _PEAK_FLOPS.get(kind)
        mfu = (flops_step / step_time / peak) if peak else None

        # XLA's own cost model for the compiled step (bytes/step for the
        # roofline argument); tolerate backends without cost_analysis
        bytes_step = None
        try:
            ca = step.lower(state, *dev_args).compile().cost_analysis()
            if ca:
                bytes_step = ca.get("bytes accessed")
        except Exception:
            pass

        # Sustained, pipeline-INCLUSIVE: stream an on-disk WAV corpus
        # through the real bucketed pipeline (grain read-ahead threads ->
        # host decode + padding + H2D overlap device steps)
        sustained, round_fps, sustained_spread = None, [], None
        if args.sustained_secs > 0:
            import tempfile

            from semi_supervised_asr_tpu.data.bucketing import (
                make_bucket_spec,
            )
            from semi_supervised_asr_tpu.data.corpus import ManifestDataset
            from semi_supervised_asr_tpu.data.grain_pipeline import (
                grain_repeating_batches,
            )

            with tempfile.TemporaryDirectory(prefix="bench_corpus_") as td:
                mpath = _gen_wav_corpus(
                    td, args.corpus_utts, f, u, cfg.frontend.hop_length
                )
                ds = ManifestDataset(mpath, vocab=None, prefer_i16=True)
                import dataclasses as _dc

                dcfg = _dc.replace(
                    cfg.data, frame_buckets=(f,), token_buckets=(u,),
                    # PCM WAV corpus -> int16 transfer is lossless and
                    # halves the H2D bytes (the recipes' default for
                    # real corpora); the step upcasts on device
                    audio_i16_transfer=True,
                )
                spec = make_bucket_spec(
                    dcfg, cfg.frontend, cfg.model.time_reduction
                )
                it = grain_repeating_batches(
                    ds, spec, cfg.frontend, b, seed=0,
                    drop_remainder=False,
                    num_threads=args.grain_threads,
                )
                # warmup: shape+dtype identical to the streamed batches
                # -> ONE extra compile for the int16-audio signature;
                # prime the pipeline threads
                bt = next(it)
                state, m = step(
                    state, bt.audio, bt.audio_lens, bt.tokens, bt.real,
                    *cmvn,
                )
                _ = float(m["loss"])
                # device-resident input prefetch (the Solver's
                # data.device_prefetch, same rationale): start the NEXT
                # batch's H2D while the current step computes — an
                # implicit numpy->device transfer inside jit dispatch
                # costs a blocking per-argument handshake through a
                # tunneled chip (~75ms/step measured; DESIGN.md)
                cmvn_dev = tuple(jax.device_put(c) for c in cmvn)

                def dev(bt):
                    return tuple(jax.device_put(x) for x in (
                        bt.audio, bt.audio_lens, bt.tokens, bt.real))

                nxt = next(it)
                nxt_d = dev(nxt)
                # measured in FENCED ROUNDS with a median + spread, the
                # same treatment the device phase got in r4 (VERDICT r4
                # weak #3: two quiet-chip runs read 117k vs 136k and
                # nothing in the artifact could say which was real).
                # Each round fetches a loss at its end, so rounds are
                # independently fenced; the median resists one round
                # eating a host hiccup (GC, tunnel stall, page cache).
                rounds = max(int(args.sustained_rounds), 1)
                per_round = args.sustained_secs / rounds
                round_fps, steps_done = [], 0
                for _r in range(rounds):
                    frames_r, steps_r = 0, 0
                    t0 = time.perf_counter()
                    deadline = t0 + per_round
                    while time.perf_counter() < deadline:
                        bt, bt_d = nxt, nxt_d
                        state, m = step(state, *bt_d, *cmvn_dev)
                        frames_r += int(bt.audio_lens[bt.real].sum()
                                        ) // cfg.frontend.hop_length
                        steps_r += 1
                        nxt = next(it)      # host assembly
                        nxt_d = dev(nxt)    # async H2D overlaps compute
                    _ = float(m["loss"])   # fence the round's tail
                    sdt = time.perf_counter() - t0
                    if steps_r > 0:
                        round_fps.append(frames_r / sdt)
                    steps_done += steps_r
                import statistics

                sustained = (statistics.median(round_fps)
                             if round_fps else None)
                sustained_spread = (max(round_fps) / max(min(round_fps),
                                                         1e-9)
                                    if round_fps else None)
                tail += (f" sustained={sustained:.0f}fps/"
                         f"{steps_done}steps/{len(round_fps)}rounds"
                         if sustained else " sustained=none")
    else:
        dt = _measure_decode(cfg, args.beam, args.warmup, args.steps,
                             audio, audio_lens, cmvn, u)
        tail = f"beam={args.beam}"
        metric = "decode_frames_per_sec_per_chip"

    n_timed = steps_run if args.mode == "train" else args.steps
    frames_total = b * f * n_timed  # 10ms audio frames consumed
    fps = frames_total / dt
    result = {
        "metric": metric,
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        # vs the 20k frames/s/chip TARGET (BASELINE.json:5) — no measured
        # reference numbers exist (BASELINE.md "published: {}")
        "vs_baseline": round(fps / 20000.0, 4),
        "vs_baseline_is": "target_20k_frames_per_sec (no reference measurement exists)",
    }
    if platform_fallback:
        result["platform_fallback"] = platform_fallback
    if args.mode == "train":
        result.update(
            sustained=round(sustained, 1) if sustained else None,
            sustained_audio="int16" if sustained else None,
            sustained_rounds_fps=(
                [round(r, 1) for r in round_fps]
                if args.sustained_secs > 0 and round_fps else None),
            sustained_spread=(round(sustained_spread, 3)
                              if sustained_spread else None),
            mfu=round(mfu, 5) if mfu is not None else None,
            model_flops_per_step=round(flops_step),
            bytes_per_step=bytes_step,
            device_kind=jax.devices()[0].device_kind,
        )
        # contention guard (VERDICT r3 #4): flag the run LOUDLY when the
        # host was busy at start or the two fenced halves disagree — a
        # shared chip/core makes every number below an artifact
        drift = max(half_ms) / max(min(half_ms), 1e-9)
        result.update(
            step_ms_halves=[round(h, 2) for h in half_ms],
            host_load1_at_start=load1_start,
        )
        if (load1_start is not None and load1_start > 1.5) or drift > 1.4:
            result["contention_warning"] = (
                f"UNRELIABLE MEASUREMENT: pre-bench host load1="
                f"{load1_start}, step-time halves "
                f"{half_ms[0]:.1f}/{half_ms[1]:.1f} ms "
                f"(drift x{drift:.2f}) — another process is likely "
                "sharing the chip/core; re-run on a quiet machine"
            )
        # same guard for the pipeline-inclusive phase: the host side
        # (grain threads + padding on a 1-core box) is MORE contention-
        # sensitive than the device phase, and r4's 117k-vs-136k spread
        # shipped with no variance bound at all
        if sustained_spread is not None and sustained_spread > 1.3:
            result["sustained_warning"] = (
                f"UNSTABLE SUSTAINED MEASUREMENT: round fps "
                f"{[round(r) for r in round_fps]} "
                f"(spread x{sustained_spread:.2f}) — median reported, "
                "but host-side throughput varied between fenced rounds; "
                "prefer a quiet machine or longer --sustained-secs"
            )
        if args.decode_steps > 0:
            # the other half of "train + decode" (BASELINE.json:5): the
            # batched jit beam on the same flagship shape, same line
            ddt = _measure_decode(
                cfg, args.beam, args.warmup, args.decode_steps,
                audio, audio_lens, cmvn, u,
            )
            result.update(
                decode_frames_per_sec_per_chip=round(
                    b * f * args.decode_steps / ddt, 1),
                decode_step_ms=round(ddt / args.decode_steps * 1000, 2),
                decode_beam=args.beam,
            )
            tail += f" decode={ddt/args.decode_steps*1000:.1f}ms@K{args.beam}"
    print(json.dumps(result))
    print(
        f"# device={jax.devices()[0]} step_time={dt/n_timed*1000:.1f}ms "
        f"batch={b} frames={f} {tail}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
