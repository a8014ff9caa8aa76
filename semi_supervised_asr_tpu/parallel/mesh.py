"""Device mesh + sharding layout (SURVEY.md §3.3, BASELINE.json:11).

The communication backend IS the JAX runtime: gradient allreduce compiles
to ICI collectives intra-slice and DCN collectives across hosts — no
NCCL/MPI.  Layout:

* axis ``data``: batch dimension sharded; params replicated -> XLA inserts
  the psum gradient allreduce (riding ICI on a real slice);
* axis ``model``: tensor parallelism of size ``model_parallel`` (default
  1) — vocab-adjacent params shard over it, see ``parallel/tp.py``.

Multi-host entry: call ``maybe_initialize_distributed()`` first; per-host
input sharding is handled by the pipeline via ``process_index``.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semi_supervised_asr_tpu.config import ParallelConfig


def maybe_initialize_distributed() -> None:
    """jax.distributed.initialize() when a multi-host env is detected."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") and jax.process_count() == 1:
        jax.distributed.initialize()


def make_mesh(
    pcfg: ParallelConfig, devices: list | None = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(pcfg.model_parallel, 1)
    assert n % mp == 0, f"{n} devices not divisible by model_parallel={mp}"
    arr = np.asarray(devices).reshape(n // mp, mp)
    return Mesh(arr, (pcfg.data_axis, pcfg.model_axis))


def host_data_rows(mesh: Mesh, pcfg: ParallelConfig) -> tuple[int, int, int]:
    """(row_start, row_end, n_rows) of THIS process on the data axis.

    Which contiguous block of data-axis rows do this host's devices
    cover?  Under DP across hosts each process owns a disjoint block;
    under cross-process TP (model axis spanning processes) several hosts
    share the same rows — they must feed IDENTICAL batch rows, which
    the shared block makes automatic.  Multi-host training uses this to
    slice each GLOBAL plan batch into the host-local part
    (pipeline._slice_rows), so every process's SPMD executable sees the
    same global shapes each step."""
    dev = mesh.devices  # [data, model]
    pid = jax.process_index()
    rows = sorted({
        i
        for i in range(dev.shape[0])
        for j in range(dev.shape[1])
        if dev[i, j].process_index == pid
    })
    assert rows, f"process {pid} owns no devices in the mesh"
    assert rows == list(range(rows[0], rows[-1] + 1)), (
        f"process {pid}'s data-axis rows {rows} are not contiguous — "
        "reorder devices so each host's block of the data axis is a slice"
    )
    return rows[0], rows[-1] + 1, dev.shape[0]


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, pcfg: ParallelConfig) -> NamedSharding:
    """Leading (batch) axis split over the data axis."""
    return NamedSharding(mesh, P(pcfg.data_axis))


def shard_batch_arrays(mesh: Mesh, pcfg: ParallelConfig, *arrays):
    """Place host arrays onto the mesh with the batch axis sharded.

    Single-host path: ``jax.device_put`` with a NamedSharding splits the
    (global) host array across local devices.  Multi-host: callers build
    global arrays with ``jax.make_array_from_process_local_data`` — this
    helper does that transparently when process_count > 1.
    """
    sh = data_sharded(mesh, pcfg)
    out = []
    for a in arrays:
        if jax.process_count() > 1:
            out.append(jax.make_array_from_process_local_data(sh, np.asarray(a)))
        else:
            out.append(jax.device_put(a, sh))
    return tuple(out)
