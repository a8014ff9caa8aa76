"""True multi-HOST semantics without a cluster: OS processes join a
jax.distributed cpu cluster (gloo collectives) and run the real Solver —
every host iterates the SAME global batch plan and assembles only its
rows of the data axis (solver._stream_shard / pipeline._slice_rows),
global batches form via make_array_from_process_local_data (the code
path single-process tests can never reach), GSPMD gradient allreduce
runs across processes, and orbax checkpoints save coordinated.

Coverage (VERDICT r1 "harden multi-host"):
* supervised DP, 2 procs x 1 device, + SHARDED eval decode (each host
  decodes only its shard of dev batches on a host-local mesh; global
  error counters agree across hosts);
* semi-supervised step (labeled + unlabeled audio + unlabeled text
  streams) on 2 procs x 2 local devices (4-device global mesh);
* tensor parallelism with the model axis SPANNING processes
  (2 procs x 1 device, model_parallel=2) — hosts share one data row and
  must feed identical batches.

Asserts: processes finish, see the expected global mesh, agree bitwise
on the final params checksum (computed DEVICE-side so TP-sharded params
never need a cross-host fetch), and eval statistics are global.
"""

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

WORKER = textwrap.dedent("""
    import json, os, sys

    spec = json.loads(sys.argv[5])
    os.environ["JAX_PLATFORMS"] = "cpu"
    # undo the suite's 8-virtual-device flag; each process contributes
    # exactly spec["local_devices"] devices so the mesh is cross-process
    n_local = int(spec.get("local_devices", 1))
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}"
        if n_local > 1 else ""
    )
    import jax
    jax.config.update("jax_platforms", "cpu")

    pid, nprocs, port, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs
    assert jax.device_count() == nprocs * n_local
    assert jax.local_device_count() == n_local

    sys.path.insert(0, os.getcwd())
    import numpy as np
    import jax.numpy as jnp
    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.training.solver import Solver

    cfg = load_config("configs/synthetic_smoke.yaml", spec["overrides"])
    solver = Solver(cfg, workdir, use_mesh=True)
    assert solver.mesh is not None
    assert solver.mesh.devices.size == nprocs * n_local
    last_eval = solver.train()

    # device-side checksum: a replicated scalar every host can fetch even
    # when params are TP-sharded across processes
    @jax.jit
    def _checksum(params):
        return sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32)))
            for x in jax.tree.leaves(params)
        )

    out = {
        "pid": pid,
        "step": int(solver.state.step),
        "checksum": float(_checksum(solver.state.params)),
        "mesh_shape": list(solver.mesh.devices.shape),
    }
    if spec.get("run_eval"):
        rate, records, _ = solver._score_batches(
            solver.bundle.dev, solver.state.params, "greedy"
        )
        out["eval_rate"] = float(rate)
        out["n_records"] = len(records)
        out["dev_size"] = len(solver.bundle.dev)
    if "dev_error" in last_eval:
        out["dev_error"] = float(last_eval["dev_error"])
    print(json.dumps(out), flush=True)
""")


def _run_cluster(tmp_path, nprocs, spec, timeout=1080):
    # timeout covers the WORST case on this 1-core host: the 4-device
    # semi-supervised step alone takes ~2.5 min of XLA compile, and
    # suite-concurrent load can triple that
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    wd = tmp_path / "run"
    # distinct port per test invocation (tmp_path differs per test), so
    # a lingering TIME_WAIT socket from the previous cluster can't block
    port = 12400 + abs(hash((os.getpid(), str(tmp_path)))) % 1000
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(nprocs), str(port),
             str(wd), json.dumps(spec)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=str(Path(__file__).resolve().parent.parent),
        )
        for i in range(nprocs)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError("multi-process run hung")
        assert p.returncode == 0, err[-3000:]
        outs.append((out, err))

    results = []
    for out, err in outs:
        lines = [l for l in out.strip().splitlines() if l.startswith("{")]
        assert lines, (out, err[-2000:])
        results.append(json.loads(lines[-1]))
    return wd, {r["pid"]: r for r in results}


def test_two_process_training_and_sharded_eval(tmp_path):
    """DP across 2 processes + host-sharded eval decode.

    32 utts over TWO frame buckets makes the global-plan requirement
    real: plan-striding per host (the old scheme) would hand the two
    hosts different bucket shapes at the same step and desync the SPMD
    executables — the shared plan + row slicing must hold instead."""
    wd, by_pid = _run_cluster(tmp_path, 2, {
        "local_devices": 1,
        "run_eval": True,
        "overrides": [
            "data.num_synthetic_utts=32",
            "train.batch_size=4",        # GLOBAL -> 2 rows per host
            "train.total_steps=6",
            "train.eval_every=0",
            "train.ckpt_every=6",
            "train.log_every=3",
            "train.async_ckpt=false",
        ],
    })
    assert set(by_pid) == {0, 1}
    assert by_pid[0]["step"] == by_pid[1]["step"] == 6
    # replicated params must agree across hosts bitwise
    assert by_pid[0]["checksum"] == by_pid[1]["checksum"]
    assert by_pid[0]["checksum"] > 0.0
    # the coordinated orbax checkpoint landed
    ckpts = list((wd / "checkpoints").glob("*"))
    assert any(d.name == "6" for d in ckpts), ckpts
    # eval sharding: same GLOBAL error rate on every host, each host
    # decoded only part of the dev set, nothing lost overall
    assert by_pid[0]["eval_rate"] == by_pid[1]["eval_rate"]
    dev = by_pid[0]["dev_size"]
    assert by_pid[0]["n_records"] + by_pid[1]["n_records"] == dev
    assert 0 < by_pid[0]["n_records"] < dev
    assert 0 < by_pid[1]["n_records"] < dev


def test_two_process_semi_supervised_two_local_devices(tmp_path):
    """Semi-supervised step (labeled + unlabeled audio + text streams)
    across 2 processes x 2 local devices: a 4-device global mesh where
    each host row-slices three independent global streams."""
    _, by_pid = _run_cluster(tmp_path, 2, {
        "local_devices": 2,
        "overrides": [
            "data.num_synthetic_utts=32",
            "train.batch_size=8",        # GLOBAL -> 4 rows/host, 2/device
            "train.total_steps=6",
            "train.eval_every=0",
            "train.ckpt_every=6",
            "train.log_every=3",
            "train.async_ckpt=false",
            "objective.lambda_text_ae=0.3",
            "objective.lambda_pseudo=0.5",
            "objective.pseudo_warmup_steps=2",
        ],
    })
    assert by_pid[0]["mesh_shape"] == [4, 1]
    assert by_pid[0]["step"] == by_pid[1]["step"] == 6
    assert by_pid[0]["checksum"] == by_pid[1]["checksum"]
    assert by_pid[0]["checksum"] > 0.0


def test_two_process_tensor_parallel(tmp_path):
    """TP with the model axis spanning processes: mesh (data=1, model=2),
    one device per host.  Both hosts own data row 0, so _stream_shard
    must feed them IDENTICAL batches; vocab-adjacent params live sharded
    across the two processes and the checksum is computed device-side."""
    _, by_pid = _run_cluster(tmp_path, 2, {
        "local_devices": 1,
        "run_eval": True,
        "overrides": [
            "data.num_synthetic_utts=16",
            "parallel.model_parallel=2",
            "train.batch_size=4",
            "train.total_steps=6",
            "train.eval_every=0",
            "train.ckpt_every=6",
            "train.log_every=3",
            "train.async_ckpt=false",
        ],
    })
    assert by_pid[0]["mesh_shape"] == [1, 2]
    assert by_pid[0]["step"] == by_pid[1]["step"] == 6
    assert by_pid[0]["checksum"] == by_pid[1]["checksum"]
    assert by_pid[0]["checksum"] > 0.0
    # TP eval keeps the global mesh and does NOT shard: every host
    # decodes the full dev set and reports the same rate
    assert by_pid[0]["eval_rate"] == by_pid[1]["eval_rate"]
    assert by_pid[0]["n_records"] == by_pid[0]["dev_size"]
    assert by_pid[1]["n_records"] == by_pid[1]["dev_size"]
