"""Explicit-collective data parallelism via shard_map + psum.

``training/train_step.make_train_step(mesh=...)`` is the production path
(GSPMD inserts the allreduce).  This module is the explicit counterpart —
a ``shard_map`` whose gradient psum is written out by hand — used to
VERIFY the distributed semantics (SURVEY.md §5.2-3: "psum-gradient ==
single-device gradient on the concatenated batch"), and as the template
for any future hand-scheduled collective (e.g. a Pallas ring allreduce).
"""

from __future__ import annotations

import jax
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from semi_supervised_asr_tpu.config import Config
from semi_supervised_asr_tpu.objectives import losses as LO
from semi_supervised_asr_tpu.training.train_step import featurize


def make_psum_grad_fn(cfg: Config, mesh: Mesh):
    """-> fn(params, audio, audio_lens, tokens, cmvn) with explicit psum.

    Per-shard forward/backward on the local batch slice, then
    ``lax.pmean(grads, 'data')`` — numerically the mean-CE gradient of the
    concatenated global batch when shards carry equal token counts; the
    determinism test in tests/test_parallel.py checks near-equality
    against the single-device gradient.
    """
    axis = cfg.parallel.data_axis

    def local_grad(params, audio, audio_lens, tokens, cmvn_mean, cmvn_std):
        def loss_fn(p):
            feats, flens = featurize(
                cfg, audio, audio_lens, (cmvn_mean, cmvn_std), None, False
            )
            loss, _ = LO.supervised_loss(
                p, cfg.model, cfg.objective, feats, flens, tokens,
                1.0, jax.random.PRNGKey(0), train=False,
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = lax.pmean(grads, axis)
        loss = lax.pmean(loss, axis)
        return loss, grads

    sharded = shard_map(
        local_grad,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
