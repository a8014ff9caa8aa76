"""Tensor parallelism over the ``model`` mesh axis (Megatron-style).

SURVEY.md §3.2 concluded DP is the only parallelism with a *guaranteed*
win at this model's size — but left a ``model`` axis stubbed.  This module
makes that axis real for the place TP genuinely pays off in this family:
the **vocabulary-adjacent matrices**.  With subword units
(``data.unit: bpe``, vocab in the thousands-to-tens-of-thousands) the
decoder output projection ``w_out [dec_out, V]`` and the embedding table
``[V, E]`` dominate the parameter budget and the decoder's matmul FLOPs;
column-/row-sharding them over ``model`` shards both the memory and the
MXU work, and XLA GSPMD inserts the (single, post-scan) all-gather where
the softmax-CE needs full logits.

What is sharded (everything else stays replicated):

* ``speller/embedding  [V, E]``  -> ``P(model, None)`` (vocab rows)
* ``speller/w_out      [D, V]``  -> ``P(None, model)`` (vocab cols)
* ``speller/b_out      [V]``     -> ``P(model)``
* ``ctc/w              [E2, V]`` -> ``P(None, model)``; ``ctc/b`` likewise
* transducer: ``predictor/embed [V, E]`` -> ``P(model, None)``;
  ``joint/w_out [J, V]`` / ``b_out [V]`` shard via the same last-key
  rules — the joint grid's [*, V] logits are where a BPE transducer's
  FLOPs and memory live, so vocab-column TP shards exactly that einsum

The LSTM gate matrices are deliberately NOT sharded: the recurrent scans
are latency-bound on the serial h->h dependency (measured — DESIGN.md
"perf decisions"), so splitting the packed ``4H`` axis would put a
collective *inside every scan step* for zero wall-clock win.  That
decision is recorded here rather than silently missing (SURVEY.md §6
"considered, not missed").

The optimizer/EMA shardings are derived from the SAME path rules: Adam's
``mu``/``nu`` subtrees mirror the param tree, so a leaf's trailing dict
keys identify it regardless of the optax wrapper it sits in.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, tree_map_with_path

from semi_supervised_asr_tpu.config import ParallelConfig


def _spec_for_path(path, shape, pcfg: ParallelConfig, axis_size: int) -> P:
    names = [k.key for k in path if isinstance(k, DictKey)]
    if not names:
        return P()
    axis = pcfg.model_axis
    last = names[-1]

    def ok(dim: int) -> bool:
        # jax.device_put / jit shardings need the sharded dim divisible by
        # the axis size (Megatron pads the vocab instead; we replicate the
        # odd leaf — TIMIT's 65-entry table isn't where TP wins anyway)
        return len(shape) > dim and shape[dim] % axis_size == 0

    if last in ("embedding", "embed"):
        # speller/LM embedding [V, E]; transducer predictor "embed"
        return P(axis, None) if ok(0) else P()
    if last == "w_out":
        return P(None, axis) if ok(1) else P()
    if last == "b_out":
        return P(axis) if ok(0) else P()
    if "ctc" in names and last == "w":
        return P(None, axis) if ok(1) else P()
    if "ctc" in names and last == "b":
        return P(axis) if ok(0) else P()
    return P()


def state_partition_specs(tree, pcfg: ParallelConfig, axis_size: int):
    """PartitionSpec pytree for any params-bearing tree (params, a full
    TrainState, or a ``jax.eval_shape`` of either)."""
    return tree_map_with_path(
        lambda path, leaf: _spec_for_path(path, leaf.shape, pcfg, axis_size),
        tree,
    )


def state_shardings(mesh: Mesh, pcfg: ParallelConfig, tree):
    """NamedSharding pytree for ``tree`` under the TP layout."""
    axis_size = dict(zip(mesh.axis_names, mesh.devices.shape))[
        pcfg.model_axis
    ]
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        state_partition_specs(tree, pcfg, axis_size),
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_state(mesh: Mesh, pcfg: ParallelConfig, state):
    """Place a concrete TrainState onto the mesh with the TP layout."""
    return jax.device_put(state, state_shardings(mesh, pcfg, state))
