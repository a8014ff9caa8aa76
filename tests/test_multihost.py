"""True multi-HOST semantics without a cluster: two OS processes join a
jax.distributed cpu cluster (gloo collectives) and run the real Solver —
per-host pipeline sharding by process_index, global batches assembled via
make_array_from_process_local_data (the code path single-process tests
can never reach), GSPMD gradient allreduce across processes, and a
coordinated orbax checkpoint save.

Asserts: both processes finish, see the 2-device global mesh, agree
bitwise on the final (replicated) params, and the checkpoint lands.
"""

import json
import os
import subprocess
import sys
import textwrap
from pathlib import Path

WORKER = textwrap.dedent("""
    import json, os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    # undo the suite's 8-virtual-device flag: each process contributes
    # exactly ONE device so the mesh is genuinely cross-process
    os.environ["XLA_FLAGS"] = ""
    import jax
    jax.config.update("jax_platforms", "cpu")

    pid, nprocs, port, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )
    assert jax.process_count() == nprocs
    assert jax.device_count() == nprocs
    assert jax.local_device_count() == 1

    sys.path.insert(0, os.getcwd())
    from semi_supervised_asr_tpu.config import load_config
    from semi_supervised_asr_tpu.training.solver import Solver

    cfg = load_config("configs/synthetic_smoke.yaml", [
        "data.num_synthetic_utts=16",
        "train.batch_size=4",        # per-host -> global batch 8
        "train.total_steps=6",
        "train.eval_every=0",
        "train.ckpt_every=6",
        "train.log_every=3",
        "train.async_ckpt=false",
    ])
    solver = Solver(cfg, workdir, use_mesh=True)
    assert solver.mesh is not None
    assert solver.mesh.devices.size == nprocs
    solver.train()

    params = jax.device_get(
        jax.tree.map(lambda x: x, solver.state.params)
    )
    import numpy as np
    checksum = float(sum(
        np.abs(np.asarray(l, np.float64)).sum()
        for l in jax.tree.leaves(params)
    ))
    print(json.dumps({"pid": pid, "step": int(solver.state.step),
                      "checksum": checksum}), flush=True)
""")


def test_two_process_training(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    wd = tmp_path / "run"
    port = 12400 + os.getpid() % 1000
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", str(port), str(wd)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=str(Path(__file__).resolve().parent.parent),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError("multi-process training hung")
        assert p.returncode == 0, err[-3000:]
        outs.append((out, err))

    results = []
    for out, err in outs:
        lines = [l for l in out.strip().splitlines() if l.startswith("{")]
        assert lines, (out, err[-2000:])
        results.append(json.loads(lines[-1]))

    by_pid = {r["pid"]: r for r in results}
    assert set(by_pid) == {0, 1}
    assert by_pid[0]["step"] == by_pid[1]["step"] == 6
    # replicated params must agree across hosts bitwise
    assert by_pid[0]["checksum"] == by_pid[1]["checksum"]
    assert by_pid[0]["checksum"] > 0.0
    # the coordinated orbax checkpoint landed
    ckpts = list((wd / "checkpoints").glob("*"))
    assert any(d.name == "6" for d in ckpts), ckpts
