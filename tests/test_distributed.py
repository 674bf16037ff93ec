"""Multi-process (multi-host) runtime: a REAL 2-process jax.distributed run.

Launches two OS processes, each owning 2 CPU devices of one 4-device global
mesh, through ``scripts/dist_worker.py``: shared coordinator, replicated
index placement across processes, per-host input striping, one jitted SPMD
align step whose psum crosses the process boundary (gloo collectives), and
per-host SAM shards merged + verified by process 0.

This is the executed counterpart of the scaffolding in
``nvbio_tpu/parallel/dist.py`` — the multi-host lift of the reference's
multi-GPU ComputeThread model (``/root/reference/nvBowtie/nvBowtie.cpp:
644-699``, ``compute_thread.cu:95-112``).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_spmd_map(tmp_path):
    from conftest import cpu_subprocess_env

    env = cpu_subprocess_env(REPO)
    # the worker pins its own device count; stale 8-device flags from the
    # test env must not leak through
    env.pop("XLA_FLAGS", None)
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", coord, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    try:
        outs = [p.communicate(timeout=570)[0] for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
        assert "DISTRIBUTED_OK" in out, out[-2000:]

    with open(tmp_path / "DIST.json") as f:
        info = json.load(f)
    assert info == {
        "processes": 2, "devices": 4, "batch": 64,
        "n_mapped": 64, "records": 64, "verified": True,
    }
    # merged SAM: one header, 64 records
    lines = (tmp_path / "out.sam").read_text().splitlines()
    assert sum(1 for ln in lines if not ln.startswith("@")) == 64
    assert sum(1 for ln in lines if ln.startswith("@SQ")) == 1
