"""Transcription CLI: raw audio files in, text out (no labels needed).

    python -m semi_supervised_asr_tpu.transcribe --config configs/x.yaml \
        --load-dir runs/x [--beam 5] [--out hyps.jsonl] a.wav b.flac dir/

The serving-side counterpart of ``--test``: loads the best checkpoint,
batches the files by frame bucket (static shapes, same bucketing as
training), decodes with beam (default) / greedy (``--beam 1``) / CTC
(``--beam 0``), and prints one JSON object per file:
``{"audio": path, "text": ..., "score": ...}``.

WAV / NPY / FLAC are supported (FLAC via the native decoder).  Files
longer than the largest frame bucket are decoded in bucket-sized chunks
and the texts joined (with a warning).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

AUDIO_EXTS = (".wav", ".npy", ".flac")


def collect_files(paths: list[str]) -> list[Path]:
    out: list[Path] = []
    for p in paths:
        p = Path(p)
        if p.is_dir():
            out.extend(sorted(
                f for f in p.rglob("*") if f.suffix.lower() in AUDIO_EXTS
            ))
        else:
            out.append(p)
    return out


def transcribe(solver, files: list[Path], mode: str,
               nbest: int = 1, timestamps: bool = False) -> list[dict]:
    """Bucket + batch the files, decode, -> [{audio, text, score}].

    ``nbest`` > 1 (beam mode only): each record also carries an "nbest"
    list of {text, score}, best first.

    ``timestamps``: each record also carries "tokens" — per-token
    [{"t", "start_s", "end_s"}] times in seconds.  CTC/LAS time the
    decoded hypothesis with Viterbi forced alignment against the CTC
    head's frame posteriors (ops/ctc_align.py; LAS needs the joint-CTC
    head), so any decode mode works; the transducer reads each token's
    emission frame out of its greedy scan (start == end — RNN-T emits
    at a point), so ``--timestamps`` forces greedy there."""
    import jax.numpy as jnp

    from semi_supervised_asr_tpu.data.corpus import load_audio
    from semi_supervised_asr_tpu.data.vocab import EOS, PAD
    from semi_supervised_asr_tpu.utils.metrics import hyp_lengths

    assert not solver.from_features, (
        "transcribe decodes raw audio; data.use_feature_store must be off"
    )
    if nbest > 1 and mode != "beam":
        raise SystemExit(
            f"--nbest needs beam decoding (got mode={mode!r}); drop "
            "--beam 0/1 or --nbest"
        )
    if solver.cfg.model.family == "transducer" and mode == "ctc":
        raise SystemExit(
            "--beam 0 (CTC greedy) is LAS-only; the transducer decodes "
            "greedy (--beam 1) or alignment-synchronous beam (--beam K)"
        )
    use_nbest = nbest > 1
    if timestamps and use_nbest:
        raise SystemExit("--timestamps times the single best hypothesis; "
                         "drop --nbest")
    spec = solver.spec
    td_times = timestamps and solver.cfg.model.family == "transducer"
    if td_times and mode != "greedy":
        raise SystemExit(
            "transducer --timestamps reads emission frames from the "
            "greedy scan — add --beam 1"
        )
    align_fn = None
    if timestamps and not td_times:
        align_fn = solver._align_fn()   # asserts the CTC head exists
    # encoder-frame duration in seconds (frame hop x total reduction)
    sec_per_frame = (
        solver.cfg.frontend.hop_length * solver.cfg.model.time_reduction
        / solver.cfg.frontend.sample_rate
    )
    if td_times:
        fn = solver._times_fn()
    elif use_nbest:
        fn = solver._beam_fn(nbest=True)
    else:
        fn = {"greedy": solver._greedy_fn, "ctc": solver._ctc_fn}.get(
            mode, solver._beam_fn)()
    # same params --test would use (best/latest or checkpoint-averaged);
    # refuses to decode with untrained params
    params = solver.eval_params(require_ckpt=True)

    max_bucket = spec.frame_buckets[-1]
    # long files decode in max_bucket-sized chunks; timestamps in chunk
    # ci offset by ci x the chunk's audio span
    chunk_off_s = (spec.samples_for_frames(max_bucket)
                   / solver.cfg.frontend.sample_rate)
    # keys: (path, chunk_index) — long files are CHUNKED at the largest
    # bucket (attention LAS is not streaming; chunked decode is the
    # standard workaround) and their texts rejoined in order
    by_bucket: dict[int, list[tuple[tuple[Path, int], np.ndarray]]] = {}
    n_chunks: dict[str, int] = {}
    for f in files:
        audio = load_audio(f)
        frames = spec.frames_for_samples(len(audio))
        if spec.frame_bucket(frames) is None:
            chunk_samples = spec.samples_for_frames(max_bucket)
            pieces = [audio[s: s + chunk_samples]
                      for s in range(0, len(audio), chunk_samples)]
            print(f"WARNING: {f} ({frames} frames) exceeds the largest "
                  f"bucket ({max_bucket}) — decoding {len(pieces)} chunks "
                  "and joining the texts", file=sys.stderr)
        else:
            pieces = [audio]
        n_chunks[str(f)] = len(pieces)
        for ci, piece in enumerate(pieces):
            fb = spec.frame_bucket(spec.frames_for_samples(len(piece)))
            by_bucket.setdefault(fb, []).append(((f, ci), piece))

    batch_size = solver.cfg.train.batch_size
    # length-cap saturation (VERDICT r4 weak #4): LAS hypotheses that
    # fill decode.max_decode_len without EOS were TRUNCATED by the cap;
    # flag each record and warn loudly when it is systemic
    track_cap = solver.cfg.model.family == "las" and mode != "ctc"
    cap_hits, n_hyps = 0, 0
    chunk_results: dict[tuple[str, int], dict] = {}
    from semi_supervised_asr_tpu.ops.frontend_oracle import pad_for_batch

    for fb, items in sorted(by_bucket.items()):
        s_len = spec.samples_for_frames(fb)
        for start in range(0, len(items), batch_size):
            chunk = items[start: start + batch_size]
            n = len(chunk)
            audio = np.zeros((batch_size, s_len), np.float32)
            lens = np.zeros((batch_size,), np.int32)
            for r, (_, a) in enumerate(chunk):
                m = min(len(a), s_len)
                audio[r] = pad_for_batch(
                    a[:m].astype(np.float32), s_len, solver.cfg.frontend
                )
                lens[r] = m
            audio_j, lens_j = jnp.asarray(audio), jnp.asarray(lens)
            mean_j = jnp.asarray(solver.cmvn[0])
            std_j = jnp.asarray(solver.cmvn[1])
            out = fn(params, audio_j, lens_j, mean_j, std_j)
            hyps = np.asarray(out[0])
            scores = np.asarray(out[1])
            starts = ends = plp = None
            if td_times:
                starts = ends = np.asarray(out[2])   # emission frame
                plp = np.full(batch_size, 0.0)
            elif align_fn is not None:
                tl = hyp_lengths(hyps)
                toks = np.where(
                    np.arange(hyps.shape[1])[None, :] < tl[:, None],
                    hyps, PAD,
                ).astype(np.int32)
                a_out = align_fn(params, audio_j, lens_j, mean_j, std_j,
                                 jnp.asarray(toks), jnp.asarray(tl))
                starts, ends = np.asarray(a_out[0]), np.asarray(a_out[1])
                plp = np.asarray(a_out[2])
            for r in range(n):
                path, ci = chunk[r][0]
                if use_nbest:
                    cands = [
                        {"text": solver.vocab.decode_text(hyps[r, j]),
                         "score": float(scores[r, j])}
                        for j in range(min(nbest, hyps.shape[1]))
                    ]
                    rec = {"text": cands[0]["text"],
                           "score": cands[0]["score"], "nbest": cands}
                else:
                    rec = {
                        "text": solver.vocab.decode_text(hyps[r]),
                        "score": float(scores[r].sum()
                                       if scores[r].ndim else scores[r]),
                    }
                if track_cap:
                    n_hyps += 1
                    best = hyps[r, 0] if use_nbest else hyps[r]
                    if not bool((best == EOS).any()):
                        cap_hits += 1
                        rec["no_eos"] = True
                if starts is not None:
                    off = ci * chunk_off_s
                    n_tok = int(hyp_lengths(hyps[r: r + 1])[0])
                    if np.isfinite(plp[r]):
                        syms = solver.vocab.decode(
                            [int(x) for x in hyps[r, :n_tok]],
                            strip_specials=False,
                        )
                        rec["tokens"] = [
                            {"t": syms[j],
                             "start_s": round(
                                 float(starts[r, j]) * sec_per_frame + off,
                                 3),
                             "end_s": round(
                                 (float(ends[r, j]) + 1) * sec_per_frame
                                 + off, 3)}
                            for j in range(n_tok)
                            if starts[r, j] >= 0
                        ]
                    else:
                        # alignment infeasible (hyp longer than the CTC
                        # path fits — e.g. a degenerate beam output)
                        rec["tokens"] = []
                        print(f"WARNING: {path} chunk {ci}: hypothesis "
                              "does not CTC-align; no timestamps",
                              file=sys.stderr)
                chunk_results[(str(path), ci)] = rec

    # assemble per file (multi-chunk: join texts, sum scores; nbest only
    # meaningful for single-chunk files)
    results = []
    for f in files:
        key = str(f)
        parts = [chunk_results[(key, ci)] for ci in range(n_chunks[key])]
        if len(parts) == 1:
            results.append({"audio": key, **parts[0]})
        else:
            rec = {
                "audio": key,
                "text": " ".join(p["text"] for p in parts if p["text"]),
                "score": float(sum(p["score"] for p in parts)),
                "chunks": len(parts),
            }
            if timestamps:
                # chunk offsets were applied per chunk; just concatenate
                rec["tokens"] = [t for p in parts
                                 for t in p.get("tokens", ())]
            results.append(rec)
    if track_cap and n_hyps and cap_hits / n_hyps > 0.01:
        print(
            f"WARNING: LENGTH-CAP SATURATION — {cap_hits}/{n_hyps} "
            f"hypotheses filled decode.max_decode_len="
            f"{solver.cfg.decode.max_decode_len} without emitting EOS; "
            "those transcripts are TRUNCATED (records carry no_eos). "
            "Raise decode.max_decode_len for long audio.",
            file=sys.stderr,
        )
    return results


def transcribe_streaming(solver, files: list[Path], beam_size: int = 1,
                         chunk_ms: int = 320,
                         timestamps: bool = False,
                         streams: int = 1) -> list[dict]:
    """Decode each file through the EXACT streaming path — the audio is
    fed in ``chunk_ms`` pieces to decode.streaming.StreamingTranscriber
    (one utterance at a time; live-microphone shape, not the batched
    bucket path).  LM fusion follows decode.lm_weight/lm_ckpt like the
    offline beam.

    ``streams`` > 1 serves that many files CONCURRENTLY through one
    decode.streaming.MultiStreamTranscriber — one jit chunk call steps
    every live stream per round (the serving-capacity mode; per-file
    results identical to streams=1, tested).  Timestamps stay
    single-stream (the multi-stream carry keeps no frame slot).

    ``timestamps`` (greedy only): each record carries "tokens" —
    per-token [{"t", "start_s", "end_s"}] from the decoder's own
    emission frames tracked ACROSS chunks (the live-caption time
    source; no second pass, no alignment model).  Same second
    convention as the offline path: a point emission at encoder frame
    f spans [f, f+1) frames."""
    import numpy as np

    from semi_supervised_asr_tpu.data.corpus import load_audio
    from semi_supervised_asr_tpu.decode.streaming import (
        StreamingTranscriber,
    )

    assert not solver.from_features, (
        "streaming decodes raw audio; data.use_feature_store must be off"
    )
    cfg = solver.cfg
    # greedy streaming biasing works too: the chunked greedy carries
    # walk the bias automaton per emission (decode/ctc.py,
    # transducer_greedy.py) — hotwords boost in live captions at K=1
    bias = solver._bias()
    if timestamps and beam_size > 1:
        raise SystemExit("--streaming --timestamps is greedy-only "
                         "(beam carries keep no frame slot); add --beam 1")
    if timestamps and streams > 1:
        raise SystemExit("--timestamps is single-stream; drop --streams")
    lm_params, lm_step = solver._lm()
    params = solver.eval_params(require_ckpt=True)
    sr = cfg.frontend.sample_rate
    sec_per_frame = cfg.frontend.hop_length * cfg.model.time_reduction / sr
    piece = max(int(sr * chunk_ms / 1000), 1)
    if streams > 1:
        from semi_supervised_asr_tpu.decode.streaming import (
            MultiStreamTranscriber,
        )

        ms = MultiStreamTranscriber(
            params, cfg, solver.cmvn, max_u=cfg.decode.max_decode_len,
            n_streams=min(streams, len(files)),
            max_symbols=cfg.decode.max_symbols, beam_size=beam_size,
            lm_params=lm_params, lm_step_fn=lm_step,
            lm_weight=cfg.decode.lm_weight,
            ilm_weight=cfg.decode.ilm_weight, bias=bias,
        )
        results = []
        for wave_start in range(0, len(files), ms.n_streams):
            wave = files[wave_start: wave_start + ms.n_streams]
            audios = [np.asarray(load_audio(f), np.float32)
                      for f in wave]
            sids = [ms.open() for _ in wave]
            cursors = [0] * len(wave)
            while any(c < len(a) for c, a in zip(cursors, audios)):
                for i, (sid, a) in enumerate(zip(sids, audios)):
                    if cursors[i] < len(a):
                        ms.feed(sid, a[cursors[i]: cursors[i] + piece])
                        cursors[i] += piece
                ms.pump()          # ONE jit call steps the whole wave
            for f, sid in zip(wave, sids):
                toks, score = ms.finalize(sid)
                results.append({
                    "audio": str(f),
                    "text": solver.vocab.decode_text(
                        np.asarray(toks, np.int32)
                    ),
                    "score": score,
                    "streaming": True,
                })
        return results
    results = []
    for f in files:
        audio = np.asarray(load_audio(f), np.float32)
        st = StreamingTranscriber(
            params, cfg, solver.cmvn, max_u=cfg.decode.max_decode_len,
            max_symbols=cfg.decode.max_symbols, beam_size=beam_size,
            lm_params=lm_params, lm_step_fn=lm_step,
            lm_weight=cfg.decode.lm_weight,
            ilm_weight=cfg.decode.ilm_weight,
            track_frames=timestamps, bias=bias,
        )
        for s in range(0, len(audio), piece):
            st.feed(audio[s: s + piece])
        toks, score = st.finalize()
        rec = {
            "audio": str(f),
            "text": solver.vocab.decode_text(np.asarray(toks, np.int32)),
            "score": score,
            "streaming": True,
        }
        if timestamps:
            frames = st.emission_frames()
            syms = solver.vocab.decode(toks, strip_specials=False)
            rec["tokens"] = [
                {"t": syms[j],
                 "start_s": round(frames[j] * sec_per_frame, 3),
                 "end_s": round((frames[j] + 1) * sec_per_frame, 3)}
                for j in range(len(toks))
                if frames[j] >= 0
            ]
        results.append(rec)
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="semi_supervised_asr_tpu.transcribe")
    p.add_argument("--config", required=True)
    p.add_argument("--load-dir", required=True,
                   help="training workdir (checkpoint + cmvn.npz)")
    p.add_argument("--beam", type=int, default=None,
                   help="beam size; 1 = greedy, 0 = CTC greedy")
    p.add_argument("--nbest", type=int, default=1,
                   help="(beam) emit the top-N hypotheses per file")
    p.add_argument("--timestamps", action="store_true",
                   help="per-token times: CTC/LAS via Viterbi forced "
                        "alignment on the CTC head (LAS needs the "
                        "joint-CTC head), transducer via greedy emission "
                        "frames (--beam 1); with --streaming (greedy "
                        "only) times come live from the chunked decode's "
                        "own emission frames")
    p.add_argument("--out", default=None, help="write jsonl here too")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--streaming", action="store_true",
                   help="decode through the exact streaming path "
                        "(StreamingTranscriber) in --stream-chunk-ms "
                        "pieces — needs a causal transducer config "
                        "(enc_bidirectional=false, frontend.center=false)")
    p.add_argument("--stream-chunk-ms", type=int, default=320,
                   help="simulated audio feed granularity (--streaming)")
    p.add_argument("--streams", type=int, default=1,
                   help="with --streaming: decode this many files "
                        "CONCURRENTLY (one jit chunk call steps every "
                        "live stream — the serving-capacity mode)")
    p.add_argument("inputs", nargs="+",
                   help="audio files (wav/npy/flac) and/or directories")
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

    # split trailing key=value overrides from input paths — an EXISTING
    # path wins even if it contains '=' (e.g. "take=2.wav")
    paths = [x for x in args.inputs
             if Path(x).exists() or "=" not in x]
    overrides += [x for x in args.inputs
                  if not Path(x).exists() and "=" in x]

    cfg = load_config(args.config, overrides)
    if args.beam is not None and args.beam > 1:
        import dataclasses

        cfg = cfg.replace(decode=dataclasses.replace(
            cfg.decode, beam_size=args.beam))
    mode = {0: "ctc", 1: "greedy"}.get(args.beam, "beam")

    files = collect_files(paths)
    if not files:
        raise SystemExit("no audio files found")
    solver = Solver(cfg, args.load_dir, use_mesh=False)
    if args.streaming:
        if args.nbest > 1:
            raise SystemExit("--streaming emits the single best path; "
                             "drop --nbest")
        results = transcribe_streaming(
            solver, files, beam_size=cfg.decode.beam_size
            if mode == "beam" else 1,
            chunk_ms=args.stream_chunk_ms,
            timestamps=args.timestamps, streams=args.streams,
        )
    else:
        results = transcribe(solver, files, mode, nbest=args.nbest,
                             timestamps=args.timestamps)
    out_f = open(args.out, "w") if args.out else None
    for rec in results:
        line = json.dumps(rec)
        print(line)
        if out_f:
            out_f.write(line + "\n")
    if out_f:
        out_f.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
