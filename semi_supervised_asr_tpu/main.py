"""CLI entry point mirroring the reference's public surface (SURVEY.md §3 #23):

    python -m semi_supervised_asr_tpu.main --config configs/timit.yaml --train
    python -m semi_supervised_asr_tpu.main --config configs/timit.yaml --test \
        [--load-dir workdir] [--beam 5]

plus dotted ``section.key=value`` overrides after ``--``:

    ... --train -- train.total_steps=2000 model.enc_hidden=512
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="semi_supervised_asr_tpu")
    p.add_argument("--config", required=True, help="hyperparameter YAML")
    mode = p.add_mutually_exclusive_group(required=True)
    mode.add_argument("--train", action="store_true")
    mode.add_argument("--test", action="store_true")
    p.add_argument("--workdir", default="runs/default",
                   help="checkpoints/logs directory")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in workdir")
    p.add_argument("--load-dir", default=None,
                   help="(test) workdir holding the checkpoint to score")
    p.add_argument("--beam", type=int, default=None,
                   help="(test) beam size override; 1 = greedy, "
                        "0 = CTC greedy (needs a CTC-head checkpoint)")
    p.add_argument("--hyp-out", default=None,
                   help="(test) write hypotheses jsonl here")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a jax platform (the axon sitecustomize "
                        "overrides JAX_PLATFORMS, so this uses jax.config)")
    p.add_argument("overrides", nargs="*", default=[],
                   help="section.key=value config overrides")
    return p


def main(argv=None) -> int:
    # the EFFECTIVE argv: what exec-restart must rebuild the command from
    # (a programmatic main([...]) call must re-exec its own arguments,
    # not the host process's sys.argv)
    eff_argv = list(sys.argv[1:]) if argv is None else list(argv)
    args = build_parser().parse_args(argv)

    if args.platform:
        import jax

        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend: under the
        # axon plugin the chip registers programmatically and
        # jax_platforms="tpu" would probe a native TPU and fail

    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.parallel.mesh import (
        maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    cfg = load_config(args.config, args.overrides)
    if args.beam is not None:
        import dataclasses

        cfg = cfg.replace(decode=dataclasses.replace(cfg.decode,
                                                     beam_size=args.beam))

    from semi_supervised_asr_tpu.training.solver import Solver

    if args.train:
        solver = Solver(cfg, args.workdir)
        result = solver.train(resume=args.resume)
        if getattr(solver, "restart_requested", False):
            # tunnel-leak mitigation (train.exec_restart_every): replace
            # this process image with a fresh one resuming from the
            # checkpoint just written — all leaked host memory returns
            # to the OS; the compile cache makes re-warm cheap
            import os

            sys.stdout.flush()
            sys.stderr.flush()
            cmd = [sys.executable, "-m",
                   "semi_supervised_asr_tpu.main", *eff_argv]
            if "--resume" not in cmd:
                # '--train' is guaranteed in eff_argv (we are in the
                # --train branch), but insert position-independently
                cmd.insert(cmd.index("--train") + 1 if "--train" in cmd
                           else len(cmd), "--resume")
            os.execv(sys.executable, cmd)
        print(json.dumps({"final_dev": result}))
        return 0

    workdir = args.load_dir or args.workdir
    solver = Solver(cfg, workdir)
    mode = {0: "ctc", 1: "greedy"}.get(args.beam, "beam")
    result = solver.test(mode=mode, out_path=args.hyp_out)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
