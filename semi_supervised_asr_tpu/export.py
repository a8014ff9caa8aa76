"""Model export for serving: decode as a serialized StableHLO artifact.

Production-deployment story beyond the research loop: a trained checkpoint
is baked (params as constants) into a self-contained, framework-free
artifact via ``jax.export`` — loadable later with only jax installed, on
any backend that can lower it (TPU serving, CPU smoke), with no model
code, config, or checkpoint tree at inference time.

    python -m semi_supervised_asr_tpu.export --config configs/timit.yaml \
        --load-dir runs/timit --out runs/timit/export \
        --batch 8 --frames 400 [--beam 5 | --greedy]

Artifacts are one-per-shape (static shapes are the TPU contract —
bucketing at serving time mirrors training); the manifest lists them.
Use :func:`load_artifact` / :func:`run_artifact` to serve.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def build_decode_fn(cfg, params, mode: str = "beam",
                    lm_params=None, lm_step_fn=None,
                    unbiased_greedy_ok: bool = False):
    """-> fn(audio [B,S], audio_lens [B]) -> (tokens, scores), params baked.

    The full serving pipeline — on-device frontend (STFT->mel->CMVN, no
    augmentation) -> listener -> batched beam/greedy — as ONE function of
    raw audio, so the artifact needs no feature preprocessing either.
    Everything the live decode uses is baked too: CTC rescoring
    (decode.ctc_weight + a CTC head in the params), shallow LM fusion
    (pass ``lm_params``/``lm_step_fn``), and contextual biasing
    (``decode.bias_phrases``/``bias_bonus`` — the compiled hotword trie
    becomes artifact constants, the serving-with-a-fixed-phrase-list
    deployment; re-export to change the list).
    """
    import jax
    import jax.numpy as jnp

    from semi_supervised_asr_tpu.decode.beam import beam_decode_from_enc
    from semi_supervised_asr_tpu.decode.greedy import greedy_decode_from_enc
    from semi_supervised_asr_tpu.models import seq2seq as M
    from semi_supervised_asr_tpu.training.train_step import featurize

    if lm_params is not None and "blocks" in lm_params:
        # transformer LM: decoding past lm.max_len would silently clamp
        # the KV-cache write position (models/lm.py) — the Solver guards
        # its live decode; the export path must too (ADVICE r1)
        assert cfg.decode.max_decode_len <= cfg.lm.max_len, (
            f"decode.max_decode_len {cfg.decode.max_decode_len} exceeds "
            f"the transformer LM's lm.max_len {cfg.lm.max_len}; a fused "
            "artifact would corrupt LM scores silently"
        )
    cmvn_mean = jnp.asarray(params.pop("__cmvn_mean"))
    cmvn_std = jnp.asarray(params.pop("__cmvn_std"))
    params = jax.tree.map(jnp.asarray, params)
    ctc_params = (params["ctc"]
                  if cfg.decode.ctc_weight > 0.0 and "ctc" in params
                  else None)
    bias = None
    if cfg.decode.bias_phrases and cfg.decode.bias_bonus != 0.0:
        if mode == "greedy" and unbiased_greedy_ok:
            # a --greedy --streaming export: the STREAMING bundle bakes
            # the biased greedy walk, while the offline greedy artifact
            # stays unbiased (the solver's offline greedy convention)
            print("note: offline greedy artifact bakes UNBIASED "
                  "(bias applies to beams and the streaming bundle)")
        elif mode == "greedy":
            # checked before the phrase file is read / trie compiled,
            # and not an assert (must survive `python -O`)
            raise SystemExit(
                "decode.bias_phrases applies to beam decode only — export "
                "--beam, add --streaming (biased greedy streams), or "
                "drop the biasing overrides"
            )
        else:
            from semi_supervised_asr_tpu.data.registry import build_vocab
            from semi_supervised_asr_tpu.decode import biasing as BZ

            vocab = build_vocab(cfg)
            bias = BZ.build_bias_trie(
                BZ.load_bias_phrases(cfg.decode.bias_phrases, vocab),
                vocab.size, cfg.decode.bias_bonus,
            )

    def fn(audio, audio_lens):
        feats, flens = featurize(
            cfg, audio, audio_lens, (cmvn_mean, cmvn_std), None, False
        )
        if cfg.model.family == "transducer":
            from semi_supervised_asr_tpu.models import transducer as TD

            enc, enc_mask = TD.encode(params, feats, flens, cfg.model)
            max_u = max(1, min(cfg.data.token_buckets[-1],
                               cfg.decode.max_decode_len))
            if mode == "greedy":
                from semi_supervised_asr_tpu.decode.transducer_greedy \
                    import transducer_greedy_from_enc

                return transducer_greedy_from_enc(
                    params, cfg.model, enc, enc_mask, max_u,
                    max_symbols=cfg.decode.max_symbols,
                )
            from semi_supervised_asr_tpu.decode.transducer_beam import (
                transducer_beam_from_enc,
            )

            return transducer_beam_from_enc(
                params, cfg.model, enc, enc_mask, max_u,
                beam_size=cfg.decode.beam_size,
                max_symbols=cfg.decode.max_symbols,
                lm_params=lm_params, lm_step_fn=lm_step_fn,
                lm_weight=cfg.decode.lm_weight,
                ilm_weight=cfg.decode.ilm_weight,
                bias=bias,
            )
        if cfg.model.family == "ctc":
            from semi_supervised_asr_tpu.models import ctc_model as CM

            enc, enc_mask = CM.encode(params, feats, flens, cfg.model)
            if mode == "greedy":
                from semi_supervised_asr_tpu.decode.ctc import (
                    ctc_greedy_from_enc,
                )

                return ctc_greedy_from_enc(params["ctc"], enc, enc_mask)
            from semi_supervised_asr_tpu.decode.ctc_beam import (
                ctc_beam_from_enc,
            )

            max_u = max(1, min(cfg.data.token_buckets[-1],
                               cfg.decode.max_decode_len))
            return ctc_beam_from_enc(
                params["ctc"], enc, enc_mask, max_u,
                beam_size=cfg.decode.beam_size,
                lm_params=lm_params, lm_step_fn=lm_step_fn,
                lm_weight=cfg.decode.lm_weight,
                bias=bias,
            )
        enc, enc_mask, keys = M.encode(params, feats, flens, cfg.model)
        max_u = max(1, min(
            cfg.data.token_buckets[-1],
            cfg.decode.max_decode_len,
            int(cfg.decode.max_decode_ratio * enc.shape[1])
            if cfg.decode.max_decode_ratio > 0 else 10**9,
        ))
        if mode == "greedy":
            toks, logp = greedy_decode_from_enc(
                params["speller"], cfg.model, enc, enc_mask, keys, max_u
            )
            return toks, jnp.sum(logp, axis=-1)
        return beam_decode_from_enc(
            params["speller"], cfg.model, cfg.decode, enc, enc_mask, keys,
            max_u, lm_params=lm_params, lm_step_fn=lm_step_fn,
            ctc_params=ctc_params, bias=bias,
        )

    return fn


def _cast_floats(tree, dtype):
    import jax
    import jax.numpy as jnp

    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )


def export_decode(cfg, params, batch: int, frames: int,
                  mode: str = "beam", lm_params=None,
                  lm_step_fn=None, param_dtype=None,
                  unbiased_greedy_ok: bool = False) -> bytes:
    """Serialize the decode fn for a fixed [batch, frames] shape.

    ``param_dtype`` (e.g. jnp.bfloat16): quantize the baked weights —
    halves the artifact and serves in the TPU-native dtype; CMVN stats
    stay float32 (they normalize the float32 feature path).
    """
    import jax
    from jax import export as jexport

    if param_dtype is not None:
        cmvn = (params.pop("__cmvn_mean"), params.pop("__cmvn_std"))
        params = _cast_floats(params, param_dtype)
        params["__cmvn_mean"], params["__cmvn_std"] = cmvn
        lm_params = (_cast_floats(lm_params, param_dtype)
                     if lm_params is not None else None)
    fn = build_decode_fn(cfg, params, mode, lm_params, lm_step_fn,
                         unbiased_greedy_ok=unbiased_greedy_ok)
    s = (frames - 1) * cfg.frontend.hop_length
    if not cfg.frontend.center:
        s += cfg.frontend.n_fft   # VALID framing needs a full first window
    specs = (
        jax.ShapeDtypeStruct((batch, s), np.float32),
        jax.ShapeDtypeStruct((batch,), np.int32),
    )
    return jexport.export(jax.jit(fn))(*specs).serialize()


def _build_bias(cfg):
    """Compiled hotword trie from the config (baked into artifacts), or
    None.  The streaming bundle bakes it at ANY beam size — biased
    GREEDY streams (decode/ctc.py, transducer_greedy.py carry slots);
    only the offline greedy artifact stays unbiased (build_decode_fn)."""
    if not (cfg.decode.bias_phrases and cfg.decode.bias_bonus != 0.0):
        return None
    from semi_supervised_asr_tpu.data.registry import build_vocab
    from semi_supervised_asr_tpu.decode import biasing as BZ

    vocab = build_vocab(cfg)
    return BZ.build_bias_trie(
        BZ.load_bias_phrases(cfg.decode.bias_phrases, vocab),
        vocab.size, cfg.decode.bias_bonus,
    )


def build_stream_export_fns(cfg, params, mode: str = "beam",
                            lm_params=None, lm_step_fn=None,
                            chunk_frames: int | None = None):
    """The four serving functions of the streaming deployment, plus the
    chunk geometry — everything jittable, params/trie/LM baked:

    * ``init()`` -> state — the fresh (encoder caches, decode carry)
      pytree.  Beam carries are materialized by a ZERO-frame decode,
      which constructs exactly the lattice the live path builds lazily
      on its first chunk (parity tested vs StreamingTranscriber).
    * ``chunk(state, audio[chunk_samples])`` -> state — one steady chunk.
    * ``final(state, audio[chunk_samples], n_samples)`` -> dec_carry —
      the masked partial last chunk.
    * ``emit(dec_carry)`` -> (tokens [max_u], count, score) — best
      hypothesis selection incl. LM-fusion weighting and the biasing
      committed/pending correction, so the host driver stays mechanical.

    Built on decode/streaming.build_stream_fns — the SAME computation
    the live StreamingTranscriber jits, by construction.
    """
    import jax
    import jax.numpy as jnp

    from semi_supervised_asr_tpu.decode.streaming import build_stream_fns

    m = cfg.model
    bias = _build_bias(cfg)
    cmvn = (jnp.asarray(params.pop("__cmvn_mean")),
            jnp.asarray(params.pop("__cmvn_std")))
    params = jax.tree.map(jnp.asarray, params)
    beam_size = 1 if mode == "greedy" else cfg.decode.beam_size
    # max_decode_len ALONE — the live streaming CLI's convention
    # (transcribe.py), so artifact-vs-live parity holds even when the
    # training token buckets are shorter than the decode budget (the
    # offline artifacts cap at token_buckets[-1] because they mirror
    # the solver's bucketed eval, a different contract)
    max_u = max(1, cfg.decode.max_decode_len)
    fns = build_stream_fns(
        params, cfg, cmvn, max_u, chunk_frames=chunk_frames,
        max_symbols=cfg.decode.max_symbols,
        beam_size=beam_size, lm_params=lm_params, lm_step_fn=lm_step_fn,
        lm_weight=cfg.decode.lm_weight, ilm_weight=cfg.decode.ilm_weight,
        bias=bias,
    )
    dec0 = fns["dec_carry0"]
    if dec0 is None:
        # beams build their carry on first contact; a zero-frame decode
        # materializes that construction without consuming any frames
        enc_dim = m.enc_out_dim
        dec0 = jax.jit(lambda: fns["decode_chunk"](
            jnp.zeros((1, 0, enc_dim)), jnp.zeros((1, 0), bool), None, 0
        ))()
    state0 = (fns["enc_state0"], dec0)

    def init():
        return state0

    def chunk(state, audio):
        enc_state, dec_carry = state
        return fns["chunk_step"](enc_state, dec_carry, audio, 0)

    def final(state, audio, n_samples):
        enc_state, dec_carry = state
        return fns["final_step"](enc_state, dec_carry, audio,
                                 n_samples, 0)

    ctc = m.family == "ctc"
    lm_w = cfg.decode.lm_weight

    def emit(dec_carry):
        if beam_size > 1:
            if ctc:
                toks, count = dec_carry[0], dec_carry[1]
                pb, pnb, lm_score = dec_carry[3], dec_carry[4], \
                    dec_carry[5]
                scores = jnp.logaddexp(pb, pnb) + lm_w * lm_score
                if bias is not None:
                    from semi_supervised_asr_tpu.decode import biasing \
                        as BZ

                    scores = scores + dec_carry[9] \
                        - BZ.bias_pending(bias, dec_carry[8])
            else:
                toks, count, scores = (dec_carry[2], dec_carry[3],
                                       dec_carry[4])
                if bias is not None:
                    from semi_supervised_asr_tpu.decode import biasing \
                        as BZ

                    scores = scores - BZ.bias_pending(bias, dec_carry[7])
            k = jnp.argmax(scores[0])
            return toks[0, k], count[0, k], scores[0, k]
        if ctc:
            out, count, score = dec_carry[1], dec_carry[2], dec_carry[3]
        else:
            out, count, score = dec_carry[2], dec_carry[3], dec_carry[4]
        score = score[0]
        if bias is not None:
            from semi_supervised_asr_tpu.decode import biasing as BZ

            if ctc:
                score = score + dec_carry[-1][0] \
                    - BZ.bias_pending(bias, dec_carry[-2])[0]
            else:
                score = score - BZ.bias_pending(bias, dec_carry[-1])[0]
        return out[0], count[0], score

    return {
        "init": init, "chunk": chunk, "final": final, "emit": emit,
        "state0": state0,
        "chunk_frames": fns["chunk_frames"],
        "chunk_samples": fns["chunk_samples"],
        "conformer": fns["conformer"],
    }


def export_streaming(cfg, params, mode: str = "beam", lm_params=None,
                     lm_step_fn=None, param_dtype=None,
                     chunk_frames: int | None = None) -> dict:
    """Serialize the four streaming serving functions -> {name: bytes},
    plus the geometry the host driver needs (returned under "meta")."""
    import jax
    from jax import export as jexport

    if param_dtype is not None:
        cmvn = (params.pop("__cmvn_mean"), params.pop("__cmvn_std"))
        params = _cast_floats(params, param_dtype)
        params["__cmvn_mean"], params["__cmvn_std"] = cmvn
        lm_params = (_cast_floats(lm_params, param_dtype)
                     if lm_params is not None else None)
    fns = build_stream_export_fns(cfg, params, mode, lm_params,
                                  lm_step_fn, chunk_frames)
    spec = lambda tree: jax.tree.map(  # noqa: E731
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
    )
    state_spec = spec(fns["state0"])
    audio_spec = jax.ShapeDtypeStruct((fns["chunk_samples"],), np.float32)
    n_spec = jax.ShapeDtypeStruct((), np.int32)
    dec_spec = state_spec[1]
    blobs = {
        "init": jexport.export(jax.jit(fns["init"]))().serialize(),
        "chunk": jexport.export(jax.jit(fns["chunk"]))(
            state_spec, audio_spec).serialize(),
        "final": jexport.export(jax.jit(fns["final"]))(
            state_spec, audio_spec, n_spec).serialize(),
        "emit": jexport.export(jax.jit(fns["emit"]))(
            dec_spec).serialize(),
    }
    m = cfg.model
    meta = {
        "chunk_frames": fns["chunk_frames"],
        "chunk_samples": fns["chunk_samples"],
        "hop_length": cfg.frontend.hop_length,
        "n_fft": cfg.frontend.n_fft,
        "time_reduction": m.time_reduction,
        # the final partial chunk pads to this frame granule (the
        # conformer's stream step is compiled for one attention chunk)
        "pad_granule": (fns["chunk_frames"] if fns["conformer"]
                        else m.time_reduction),
        "mode": mode,
    }
    return {"blobs": blobs, "meta": meta}


class StreamingArtifact:
    """Serve an exported streaming bundle — the host side is purely
    mechanical (buffering + overlap bookkeeping); every model/decode
    decision lives in the baked StableHLO functions.

    >>> sa = StreamingArtifact("runs/x/export")
    >>> for piece in audio_pieces:
    ...     sa.feed(piece)
    >>> tokens, score = sa.finalize()

    Feed/emit semantics mirror :class:`~.decode.streaming.
    StreamingTranscriber` exactly (parity tested token-for-token)."""

    def __init__(self, out_dir: str | Path):
        from jax import export as jexport

        out = Path(out_dir)
        manifest = json.loads((out / "manifest.json").read_text())
        meta = manifest.get("streaming")
        if not meta:
            raise ValueError(
                f"{out}: manifest has no streaming section — export "
                "with --streaming"
            )
        self.meta = meta
        load = lambda n: jexport.deserialize(  # noqa: E731
            (out / meta["files"][n]).read_bytes()
        )
        self._chunk = load("chunk")
        self._final = load("final")
        self._emit = load("emit")
        self._state = jexport.deserialize(
            (out / meta["files"]["init"]).read_bytes()
        ).call()
        self._audio = np.zeros((0,), np.float32)
        self._hop = meta["hop_length"]
        self._n_fft = meta["n_fft"]
        self._chunk_samples = meta["chunk_samples"]
        self._chunk_frames = meta["chunk_frames"]
        self._dec = self._state[1]
        self._done = False

    def feed(self, samples: np.ndarray) -> None:
        assert not self._done, "finalize() already called"
        self._audio = np.concatenate(
            [self._audio, np.asarray(samples, np.float32)]
        )
        while len(self._audio) >= self._chunk_samples:
            chunk = np.asarray(self._audio[: self._chunk_samples])
            self._state = self._chunk.call(self._state, chunk)
            self._dec = self._state[1]
            # keep the n_fft - hop overlap the next frame window needs
            self._audio = self._audio[self._chunk_frames * self._hop:]

    @property
    def tokens(self) -> list:
        toks, count, _ = self._emit.call(self._dec)
        return [int(x) for x in np.asarray(toks)[: int(count)]]

    def finalize(self) -> tuple[list, float]:
        rem = len(self._audio)
        n_frames = (
            1 + (rem - self._n_fft) // self._hop
            if rem >= self._n_fft else 0
        )
        if n_frames > 0:
            red = self.meta["pad_granule"]
            pad_frames = -(-n_frames // red) * red
            assert pad_frames <= self._chunk_frames, (
                pad_frames, self._chunk_frames
            )
            audio = np.zeros((self._chunk_samples,), np.float32)
            audio[:rem] = self._audio
            self._dec = self._final.call(
                self._state, audio, np.int32(rem)
            )
        toks, count, score = self._emit.call(self._dec)
        self._audio = np.zeros((0,), np.float32)
        self._done = True
        return ([int(x) for x in np.asarray(toks)[: int(count)]],
                float(score))


def stream_artifact_decode(out_dir: str | Path, audio: np.ndarray,
                           piece_samples: int | None = None):
    """Decode ``audio`` through an exported streaming bundle."""
    sa = StreamingArtifact(out_dir)
    n = piece_samples or len(audio)
    for s in range(0, len(audio), n):
        sa.feed(audio[s: s + n])
    return sa.finalize()


def load_artifact(path: str | Path):
    """-> callable(audio, audio_lens) -> (tokens, scores)."""
    from jax import export as jexport

    exp = jexport.deserialize(Path(path).read_bytes())
    return lambda audio, audio_lens: exp.call(audio, audio_lens)


def run_artifact(path: str | Path, audio: np.ndarray,
                 audio_lens: np.ndarray):
    return load_artifact(path)(audio, audio_lens)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="semi_supervised_asr_tpu.export")
    p.add_argument("--config", required=True)
    p.add_argument("--load-dir", required=True,
                   help="training workdir (checkpoints + cmvn.npz)")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=str, default=None,
                   help="comma list of frame buckets (e.g. 200,400); "
                        "default: the config's data.frame_buckets")
    p.add_argument("--greedy", action="store_true",
                   help="export greedy instead of beam decode")
    p.add_argument("--streaming", action="store_true",
                   help="ALSO export the streaming deployment: "
                        "init/chunk/final/emit StableHLO functions with "
                        "explicit carry pytrees (frontend overlap, "
                        "listener caches, decode carry; bias trie and "
                        "fusion LM baked) + a manifest section for the "
                        "StreamingArtifact host driver; requires a "
                        "streamable config (frame-synchronous family, "
                        "causal listener, center=false, global CMVN)")
    p.add_argument("--stream-chunk", type=int, default=None,
                   help="streaming chunk size in FEATURE frames "
                        "(default: the model's latency granule — "
                        "time_reduction for the LSTM listener, "
                        "enc_attn_chunk*2**conv_subsample for the "
                        "conformer, which accepts exactly that)")
    p.add_argument("--bf16", action="store_true",
                   help="quantize baked weights to bfloat16 (half the "
                        "artifact, TPU-native serving dtype)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend: under the
        # axon plugin the chip registers programmatically and
        # jax_platforms="tpu" would probe a native TPU and fail

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.training.solver import Solver

    cfg = load_config(args.config, args.overrides)
    solver = Solver(cfg, args.load_dir, use_mesh=False)
    if solver.ckpt.latest_step() is None:
        raise SystemExit(
            f"{args.load_dir}: no checkpoint found — exporting untrained "
            "params would produce a garbage serving artifact (check the "
            "--load-dir path / train first)"
        )
    step = solver.ckpt.best_step() or solver.ckpt.latest_step()
    state, _, _ = solver.ckpt.restore(solver.state, step)
    params = dict(state.params)
    params["__cmvn_mean"], params["__cmvn_std"] = solver.cmvn

    mode = "greedy" if args.greedy else "beam"
    lm_params, lm_step = solver._lm()   # shallow fusion, like live decode
    frames = ([int(f) for f in str(args.frames).split(",")]
              if args.frames else list(solver.spec.frame_buckets))
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    manifest = []
    import jax.numpy as jnp

    pdt = jnp.bfloat16 if args.bf16 else None
    for fcount in frames:
        blob = export_decode(solver.cfg, dict(params), args.batch, fcount,
                             mode, lm_params, lm_step, param_dtype=pdt,
                             unbiased_greedy_ok=args.streaming)
        name = f"decode_{mode}_b{args.batch}_f{fcount}.shlo"
        (out / name).write_bytes(blob)
        manifest.append({
            "file": name, "mode": mode, "batch": args.batch,
            "param_dtype": "bfloat16" if args.bf16 else "float32",
            "frames": fcount, "bytes": len(blob),
            "samples": (fcount - 1) * cfg.frontend.hop_length
            + (0 if cfg.frontend.center else cfg.frontend.n_fft),
        })
        print(f"exported {name} ({len(blob)/1e6:.1f} MB)")
    top = {
        "artifacts": manifest,
        "vocab_unit": cfg.data.unit,
        "hop_length": cfg.frontend.hop_length,
    }
    if args.streaming:
        bundle = export_streaming(
            solver.cfg, dict(params), mode, lm_params, lm_step,
            param_dtype=pdt, chunk_frames=args.stream_chunk,
        )
        files = {}
        for name, blob in bundle["blobs"].items():
            fname = f"stream_{mode}_{name}.shlo"
            (out / fname).write_bytes(blob)
            files[name] = fname
            print(f"exported {fname} ({len(blob)/1e6:.1f} MB)")
        top["streaming"] = {
            **bundle["meta"], "files": files,
            "param_dtype": "bfloat16" if args.bf16 else "float32",
        }
    (out / "manifest.json").write_text(json.dumps(top, indent=1))
    solver.vocab.save(out / "vocab.json")
    print(f"manifest + vocab -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
