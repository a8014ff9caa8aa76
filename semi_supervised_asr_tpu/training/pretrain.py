"""BEST-RQ encoder pretraining driver (objectives/best_rq.py).

    python -m semi_supervised_asr_tpu.training.pretrain \
        --config configs/ls100_semi.yaml --workdir runs/bestrq

Trains the configured listener (any ``model.encoder_arch`` /
``model.lstm_backend``) on the config's unlabeled-AUDIO stream (falling
back to the labeled audio; transcripts are never read) with one fused
jit step: on-device frontend -> frozen-quantizer targets on the clean
features -> span masking -> listener -> linear head -> masked CE ->
grad -> update.  Multi-device: the step jits over the data axis of the
standard mesh (GSPMD allreduce), per-host row slicing like the Solver.

Artifacts in ``--workdir``:
* ``encoder_params/`` — orbax checkpoint of the LISTENER subtree alone;
  point ``train.init_encoder_from`` at the workdir to start any family's
  training from it (Solver restores it over the fresh init).
* ``bestrq_params/`` — listener + prediction head (for probing/resume).
* ``meta.json`` — dims + quantizer knobs for loader sanity checks.
* ``metrics.jsonl`` / tensorboard scalars — loss, masked-position
  accuracy, codebook utilization.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from semi_supervised_asr_tpu.config import Config, load_config
from semi_supervised_asr_tpu.data import pipeline as pipe
from semi_supervised_asr_tpu.data import registry
from semi_supervised_asr_tpu.data.bucketing import make_bucket_spec
from semi_supervised_asr_tpu.objectives import best_rq as BRQ
from semi_supervised_asr_tpu.parallel import mesh as MESH
from semi_supervised_asr_tpu.training import schedules
from semi_supervised_asr_tpu.training import train_step as TS
from semi_supervised_asr_tpu.utils.logging import MetricsLogger


def encoder_ckpt_dir(workdir: str | Path) -> Path:
    return Path(workdir).absolute() / "encoder_params"


def load_pretrained_encoder(workdir: str | Path, template) -> dict:
    """Restore the pretrained listener subtree over ``template`` (the
    fresh init — shapes/dtypes must match, i.e. the finetune config's
    encoder dims equal the pretraining config's)."""
    meta_path = Path(workdir) / "meta.json"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())
        n_leaves = len(jax.tree.leaves(template))
        assert meta.get("n_listener_leaves") in (None, n_leaves), (
            f"pretrained encoder at {workdir} has "
            f"{meta['n_listener_leaves']} param leaves, the finetune "
            f"model's listener has {n_leaves} — encoder dims/arch differ"
        )
    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(encoder_ckpt_dir(workdir), target=template)


def _init_params(cfg: Config, vocab_size: int) -> dict:
    """Listener (via the family-shared init) + prediction head."""
    from semi_supervised_asr_tpu.models import seq2seq as M

    mcfg = dataclasses.replace(
        cfg.model, vocab_size=vocab_size, n_mels=cfg.frontend.n_mels
    )
    k_enc, k_head = jax.random.split(jax.random.PRNGKey(cfg.train.seed))
    enc_init, _ = M._listener_fns(mcfg)
    dtype = jnp.dtype(mcfg.param_dtype)
    return {
        "listener": enc_init(k_enc, mcfg, dtype),
        "head": BRQ.init_bestrq_head(k_head, mcfg, cfg.pretrain, dtype),
    }, mcfg


def train_bestrq(
    cfg: Config, workdir: str | Path, use_mesh: bool | None = None
) -> dict:
    workdir = Path(workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    log = MetricsLogger(workdir)
    bundle = registry.build_datasets(cfg)
    audio_ds = bundle.unlabeled_audio or bundle.train

    params, mcfg = _init_params(cfg, bundle.vocab.size)
    cfg = cfg.replace(model=mcfg)
    opt = schedules.make_optimizer(cfg.train)
    opt_state = opt.init(params)

    spec = make_bucket_spec(cfg.data, cfg.frontend, mcfg.time_reduction)
    from_features = cfg.data.use_feature_store

    # global CMVN over the PRETRAIN corpus (cached like the Solver's)
    stats_path = workdir / "cmvn.npz"
    if stats_path.exists():
        z = np.load(stats_path)
        cmvn = (z["mean"], z["inv_std"])
    else:
        if from_features:
            mean, inv_std = pipe.compute_global_cmvn_features(audio_ds)
        else:
            mean, inv_std = pipe.compute_global_cmvn(audio_ds, cfg.frontend)
        import os as _os
        tmp = stats_path.with_suffix(
            f".{_os.getpid()}.{jax.process_index()}.tmp.npz"
        )
        np.savez(tmp, mean=mean, inv_std=inv_std)
        _os.replace(tmp, stats_path)
        cmvn = (mean, inv_std)

    # numpy on purpose: closed over as jit CONSTANTS (baked into the
    # executable once — no per-step transfer, and no committed-device
    # conflict under the multi-device mesh)
    proj, codebook = BRQ.make_quantizer(
        cfg.frontend.n_mels, mcfg.time_reduction, cfg.pretrain
    )

    if use_mesh is None:
        use_mesh = len(jax.devices()) > 1
    mesh = MESH.make_mesh(cfg.parallel) if use_mesh else None
    if mesh is not None:
        n_data = mesh.devices.shape[0]
        assert cfg.train.batch_size % n_data == 0, (
            f"global batch_size {cfg.train.batch_size} not divisible by "
            f"the data axis ({n_data})"
        )

    def loss_fn(p, rng, audio, audio_lens, real):
        if from_features:
            feats, feat_lens = TS.featurize_precomputed(
                cfg, audio, audio_lens, cmvn, None, augment=False
            )
        else:
            feats, feat_lens = TS.featurize(
                cfg, audio, audio_lens, cmvn, None, augment=False
            )
        return BRQ.bestrq_loss(
            p, mcfg, cfg.pretrain, feats, feat_lens, real, rng,
            proj, codebook,
        )

    def step(p, o, step_idx, audio, audio_lens, real):
        rng = jax.random.fold_in(
            jax.random.PRNGKey(cfg.train.seed + 99), step_idx
        )
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, rng, audio, audio_lens, real)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        metrics["loss"] = loss
        return p, o, metrics

    if mesh is not None:
        repl = MESH.replicated(mesh)
        data = MESH.data_sharded(mesh, cfg.parallel)
        step = jax.jit(
            step,
            in_shardings=(repl, repl, None, data, data, data),
            out_shardings=(repl, repl, repl),
        )
    else:
        step = jax.jit(step)

    # ---- exact resume: one batch per step, so fast-forwarding the
    # deterministic stream by the restored step count (plan cost only)
    # + the stateless per-step PRNG (fold_in(step)) makes the resumed
    # trajectory bitwise-equal to an uninterrupted run
    resume_dir = workdir.absolute() / "train_ckpt"
    done = 0
    saver = ocp.StandardCheckpointer()
    if (resume_dir / "_CHECKPOINT_METADATA").exists():
        tree = saver.restore(
            resume_dir,
            target={"params": params, "opt_state": opt_state, "step": 0},
        )
        params, opt_state = tree["params"], tree["opt_state"]
        done = int(tree["step"])
        log.info(f"bestrq resumed from step {done}")

    def save_resume(step_done: int) -> None:
        saver.save(
            resume_dir,
            {"params": params, "opt_state": opt_state, "step": step_done},
            force=True,
        )
        saver.wait_until_finished()

    shard, n_shards = jax.process_index(), jax.process_count()
    row_shard = None
    if mesh is not None and jax.process_count() > 1:
        shard, n_shards = 0, 1
        row_shard = MESH.host_data_rows(mesh, cfg.parallel)
    if from_features:
        stream = pipe.repeating_feature_batches(
            audio_ds, spec, cfg.train.batch_size, cfg.train.seed,
            shard_index=shard, num_shards=n_shards,
            drop_remainder=False, row_shard=row_shard,
            skip_batches=done,
        )
    else:
        stream = pipe.repeating_batches(
            audio_ds, spec, cfg.frontend, cfg.train.batch_size,
            cfg.train.seed, shard_index=shard, num_shards=n_shards,
            drop_remainder=False, row_shard=row_shard,
            skip_batches=done,
        )

    def put(*arrays):
        if mesh is not None:
            return MESH.shard_batch_arrays(mesh, cfg.parallel, *arrays)
        return tuple(jnp.asarray(a) for a in arrays)

    first_loss, metrics = None, {}
    t0 = time.perf_counter()
    for i in range(done + 1, cfg.pretrain.total_steps + 1):
        b = next(stream)
        if from_features:
            args = put(b.feats, b.feat_lens, b.real)
        else:
            args = put(b.audio, b.audio_lens, b.real)
        params, opt_state, metrics = step(
            params, opt_state, jnp.asarray(i, jnp.int32), *args
        )
        if i % cfg.pretrain.log_every == 0 or i == 1:
            m = {k: float(v) for k, v in metrics.items()}
            if first_loss is None:
                first_loss = m["loss"]
            log.log(i, {f"bestrq_{k}": v for k, v in m.items()}, "pretrain")
            log.info(
                f"bestrq step {i} loss {m['loss']:.4f} "
                f"mask_acc {m['mask_acc']:.3f} "
                f"codes_used {m['codes_used']:.3f}"
            )
        if cfg.pretrain.ckpt_every > 0 and i % cfg.pretrain.ckpt_every == 0:
            save_resume(i)

    save_resume(cfg.pretrain.total_steps)
    saver.close()
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(encoder_ckpt_dir(workdir), params["listener"],
                  force=True)
        ckpt.save(workdir.absolute() / "bestrq_params", params,
                  force=True)
    (workdir / "meta.json").write_text(json.dumps({
        "encoder_arch": mcfg.encoder_arch,
        "enc_hidden": mcfg.enc_hidden,
        "time_reduction": mcfg.time_reduction,
        "n_listener_leaves": len(jax.tree.leaves(params["listener"])),
        "codebook_size": cfg.pretrain.codebook_size,
        "codebook_dim": cfg.pretrain.codebook_dim,
        "quantizer_seed": cfg.pretrain.quantizer_seed,
        "steps": cfg.pretrain.total_steps,
    }))
    out = {k: float(v) for k, v in metrics.items()}
    out["first_loss"] = first_loss if first_loss is not None else float("nan")
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--workdir", default="runs/bestrq")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)
    if args.platform and args.platform != "tpu":
        # --platform tpu keeps the DEFAULT backend (axon plugin registers
        # programmatically; jax_platforms="tpu" would probe and fail)
        jax.config.update("jax_platforms", args.platform)
    MESH.maybe_initialize_distributed()
    cfg = load_config(args.config, args.overrides)
    result = train_bestrq(cfg, args.workdir)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
