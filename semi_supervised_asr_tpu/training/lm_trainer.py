"""External LM training on unlabeled text (SURVEY.md §3 #17).

    python -m semi_supervised_asr_tpu.training.lm_trainer \
        --config configs/ls100_semi.yaml --workdir runs/lm

Trains the fusion LM (models/lm.py) on the config's unlabeled-text stream
(falling back to the labeled transcripts) with one jit next-token-CE step,
and saves params with orbax.  ``decode.lm_ckpt`` pointing at the workdir +
``decode.lm_weight > 0`` enables shallow fusion in Solver.test.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np
import optax
import orbax.checkpoint as ocp

from semi_supervised_asr_tpu.config import Config, load_config
from semi_supervised_asr_tpu.data import registry
from semi_supervised_asr_tpu.data import pipeline as pipe
from semi_supervised_asr_tpu.models import lm as LM
from semi_supervised_asr_tpu.utils.logging import MetricsLogger


def lm_ckpt_dir(workdir: str | Path) -> Path:
    return Path(workdir).absolute() / "lm_params"


def save_lm(workdir: str | Path, params: dict) -> None:
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(lm_ckpt_dir(workdir), params)


def init_lm_params(cfg: Config, vocab_size: int, seed: int = 0) -> dict:
    """Architecture-dispatching init (lm.arch: lstm | transformer)."""
    if cfg.lm.arch == "transformer":
        return LM.init_transformer_lm(
            jax.random.PRNGKey(seed), vocab_size, cfg.lm.embed_dim,
            cfg.lm.layers, cfg.lm.heads, cfg.lm.ff_dim, cfg.lm.max_len,
        )
    assert cfg.lm.arch == "lstm", cfg.lm.arch
    return LM.init_lm(
        jax.random.PRNGKey(seed), vocab_size, cfg.lm.embed_dim,
        cfg.lm.hidden, cfg.lm.layers,
    )


def load_lm(
    workdir: str | Path, cfg: Config, vocab_size: int,
    dims: tuple[int, int, int] | None = None,
) -> dict:
    """Restore a trained LM.  ``dims`` = (embed, hidden, layers) overrides
    the template with an LSTM architecture (deep/cold fusion reads
    model.lm_fusion_* instead of cfg.lm; the grafted LM is LSTM-only —
    its state rides inside the speller scan carry)."""
    if dims is not None:
        embed, hidden, layers = dims
        template = LM.init_lm(
            jax.random.PRNGKey(0), vocab_size, embed, hidden, layers,
        )
    else:
        template = init_lm_params(cfg, vocab_size)
    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(lm_ckpt_dir(workdir), target=template)


def train_lm(cfg: Config, workdir: str | Path) -> dict:
    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    log = MetricsLogger(workdir)
    bundle = registry.build_datasets(cfg)
    text_ds = bundle.unlabeled_text or bundle.train

    params = init_lm_params(cfg, bundle.vocab.size, cfg.train.seed)
    opt = optax.adam(cfg.lm.learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(LM.lm_loss)(params, tokens)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    token_bucket = max(cfg.data.token_buckets)
    if cfg.lm.arch == "transformer":
        assert token_bucket <= cfg.lm.max_len, (
            f"lm.max_len {cfg.lm.max_len} must cover the largest token "
            f"bucket {token_bucket}"
        )
    # every process trains the SAME full stream: the step has no
    # cross-process collective, so striding the text per host (the
    # old scheme) would produce divergent per-host LMs racing on one
    # save path — identical deterministic streams give every host the
    # bitwise-same (small) LM instead
    stream = pipe.text_batches(
        text_ds, token_bucket, cfg.lm.batch_size, cfg.train.seed,
    )
    loss = None
    for i in range(1, cfg.lm.total_steps + 1):
        tokens, real = next(stream)
        tokens = np.where(real[:, None], tokens, 0)
        params, opt_state, loss = step(params, opt_state, tokens)
        if i % cfg.lm.log_every == 0:
            val = float(loss)
            log.log(i, {"lm_loss": val, "lm_ppl": float(np.exp(val))}, "lm")
            log.info(f"lm step {i} loss {val:.4f} ppl {np.exp(val):.1f}")
    save_lm(workdir, params)
    final = float(loss) if loss is not None else float("nan")
    return {"lm_loss": final, "lm_ppl": float(np.exp(final))}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--workdir", default="runs/lm")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)
    if args.platform:
        if args.platform != "tpu":
            jax.config.update("jax_platforms", args.platform)
        # --platform tpu keeps the DEFAULT backend: under the
        # axon plugin the chip registers programmatically and
        # jax_platforms="tpu" would probe a native TPU and fail
    cfg = load_config(args.config, args.overrides)
    result = train_lm(cfg, args.workdir)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
