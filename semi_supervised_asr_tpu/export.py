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
                    lm_params=None, lm_step_fn=None):
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
        if mode == "greedy":
            # checked before the phrase file is read / trie compiled,
            # and not an assert (must survive `python -O`)
            raise SystemExit(
                "decode.bias_phrases applies to beam decode only — export "
                "--beam, or drop the biasing overrides"
            )
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
                  lm_step_fn=None, param_dtype=None) -> bytes:
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
    fn = build_decode_fn(cfg, params, mode, lm_params, lm_step_fn)
    s = (frames - 1) * cfg.frontend.hop_length
    if not cfg.frontend.center:
        s += cfg.frontend.n_fft   # VALID framing needs a full first window
    specs = (
        jax.ShapeDtypeStruct((batch, s), np.float32),
        jax.ShapeDtypeStruct((batch,), np.int32),
    )
    return jexport.export(jax.jit(fn))(*specs).serialize()


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
                             mode, lm_params, lm_step, param_dtype=pdt)
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
    (out / "manifest.json").write_text(json.dumps({
        "artifacts": manifest,
        "vocab_unit": cfg.data.unit,
        "hop_length": cfg.frontend.hop_length,
    }, indent=1))
    solver.vocab.save(out / "vocab.json")
    print(f"manifest + vocab -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
