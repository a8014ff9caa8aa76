"""Mesh context so Pallas kernels partition over the batch axis (C5).

``pl.pallas_call`` has NO GSPMD partitioning rule: inside a jit whose
arguments carry ``NamedSharding``s (training/train_step.make_train_step
with a mesh), XLA's partitioner would have to all-gather the kernel's
operands and run the FULL global batch on every device — silently
discarding the data-parallel speedup the mesh exists for (or failing to
compile).  The round-1 multi-device tests never saw this because off-TPU
the kernels fall back to XLA scans (VERDICT.md "What's missing" #2).

The structural fix: the train step / decode builders enter
``kernel_mesh(mesh, data_axis)`` around tracing, and every op that
invokes ``pallas_call`` (ops/pallas_lstm.py, ops/pallas_frontend.py)
consults ``active()`` and wraps itself in ``jax.shard_map`` over the
batch axis.  Each device then runs the kernel on its OWN batch shard —
per-shard shapes make the kernels' tiling contracts (B%8==0, H%128==0,
T%8==0) concrete, and the surrounding GSPMD program keeps inserting the
gradient allreduce as before.  shard_map nests inside GSPMD-partitioned
jit as a manual subregion, so nothing else changes.

Gradient correctness under ``check_vma=False``: cotangents of inputs
declared replicated (``P()``) are psum'd over every mesh axis they do not
mention.  That is exactly right for the recurrent weights under the
data-only wrap (sum of per-shard dW == global-batch dW), but would
OVERCOUNT by the model-axis size when model_parallel > 1 — which is why
``make_train_step`` keeps refusing mesh×pallas-LSTM under TP
(train_step.py).  The frontend kernel carries no differentiable inputs,
so it wraps safely under any mesh layout.

Test hook: ``SSASR_PALLAS_INTERPRET=1`` makes the kernels run in Pallas
interpret mode off-TPU instead of falling back to the XLA scan, so the
8-virtual-device CPU mesh (tests/, __graft_entry__.dryrun_multichip)
exercises the PRODUCTION kernel paths, not their fallbacks.
"""

from __future__ import annotations

import contextlib
import os
import threading

_state = threading.local()


def active():
    """-> (mesh, batch_axis_name) when a kernel mesh is in scope, else None."""
    return getattr(_state, "ctx", None)


@contextlib.contextmanager
def kernel_mesh(mesh, batch_axis: str = "data"):
    """Scope under which Pallas ops shard_map themselves over ``batch_axis``.

    ``mesh=None`` clears the context (used by the ops themselves so the
    recursive call inside the shard_map body does not re-wrap).
    """
    prev = getattr(_state, "ctx", None)
    _state.ctx = None if mesh is None else (mesh, batch_axis)
    try:
        yield
    finally:
        _state.ctx = prev


def interpret_forced() -> bool:
    """True when SSASR_PALLAS_INTERPRET=1: run Pallas kernels in interpret
    mode off-TPU (tests / dryrun) instead of the XLA-scan fallback."""
    return os.environ.get("SSASR_PALLAS_INTERPRET", "") == "1"
