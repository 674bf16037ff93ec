"""Multi-host runtime: jax.distributed init, per-host input striping, global
batch placement, and SAM shard merging.

The reference's scaling unit is one process driving N GPUs through
ComputeThreads with host-merged stats (``nvBowtie/nvBowtie.cpp:644-699``,
``compute_thread.cu:95-112``); it has no cross-node story (SURVEY §2.5 #10).
The TPU-native design goes through ``jax.distributed``: every host process
initializes into one runtime, builds ONE global mesh over all chips, feeds
its own stripe of the input (DCN does not see read data — only the
coordination plane), and the SPMD step's collectives ride ICI. Each host
writes its own SAM shard; ``merge_sam_shards`` concatenates them under a
single header (the analogue of nvBowtie's in-process stats/output merge).

Single-process use is the common case and needs no initialization: every
helper degrades to the local mesh.
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, Sequence

import jax
import numpy as np

from nvbio_tpu.parallel.mesh import READS_AXIS, make_reads_mesh


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize the multi-host runtime (idempotent).

    Explicit args win; otherwise standard env vars are honored
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``,
    or cloud-TPU metadata which jax.distributed auto-detects). Returns True
    if a multi-process runtime was initialized, False for the single-process
    fallback (no coordinator configured — everything still works on the
    local devices).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    # NB: probing via jax.process_count() would itself initialize the XLA
    # backend and make the subsequent initialize() call illegal
    if jax.distributed.is_initialized():
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_reads_mesh():
    """1-D reads mesh over ALL devices of ALL processes (== the local mesh
    in single-process runs)."""
    return make_reads_mesh(devices=jax.devices())


def host_stripe(batches: Iterable, process_id: int | None = None,
                num_processes: int | None = None) -> Iterator:
    """Round-robin stripe of an input batch stream for this host.

    Every process runs the same input scan but keeps batches
    ``i % num_processes == process_id`` — per-host input sharding without a
    shared filesystem coordinator (the multi-host analogue of the
    InputThread free-buffer pool, ``input_thread.cpp:42-184``).
    """
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    for i, b in enumerate(batches):
        if i % n == pid:
            yield b


def global_batch(mesh, arr: np.ndarray):
    """Place this host's batch rows as the process-local shard of a GLOBAL
    array sharded over READS_AXIS.

    In single-process runs this is exactly ``shard_batch``; multi-host, each
    process contributes its local rows and the result is a global jax.Array
    of shape (rows * num_processes, ...).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(READS_AXIS))
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    global_shape = (arr.shape[0] * jax.process_count(),) + arr.shape[1:]
    return jax.make_array_from_process_local_data(sharding, arr, global_shape)


def place_replicated(mesh, tree):
    """Replicate a host pytree onto every device of a (possibly
    multi-process) global mesh.

    Single-process placement is a plain ``device_put``; multi-process goes
    through ``jax.make_array_from_callback`` — every process holds identical
    host data and contributes the shards it can address, which is the only
    placement path that works when the sharding spans other processes'
    devices. The reference replicates its index per GPU the same way, one
    ``cudaMemcpy`` per ComputeThread (``compute_thread.cu:95-112``).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)

    def leaf(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])

    return jax.tree.map(leaf, tree)


def local_rows(tree):
    """This process's rows of a batch-sharded global pytree, as host numpy.

    Shards come back ordered by global row offset, so with the 1-D reads
    mesh the result is the process's contiguous slice of the global batch
    (rows ``[pid * B/n_proc, (pid+1) * B/n_proc)``) — the rows this host
    formats into its own SAM shard.
    """
    def leaf(x):
        shards = sorted(x.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)

    return jax.tree.map(leaf, tree)


def shard_path(base: str, process_id: int | None = None) -> str:
    """Per-host output shard path: ``out.sam`` -> ``out.sam.shard0007``."""
    pid = jax.process_index() if process_id is None else process_id
    return f"{base}.shard{pid:04d}"


def merge_sam_shards(paths: Sequence[str], out_path: str,
                     remove: bool = False) -> int:
    """Concatenate SAM shards under the first shard's header.

    Returns the number of alignment records written. Shards are assumed to
    share an identical header (same reference); bodies append in shard
    order so output is deterministic.
    """
    n = 0
    with open(out_path, "w") as out:
        for i, p in enumerate(paths):
            with open(p) as f:
                for line in f:
                    if line.startswith("@"):
                        if i == 0:
                            out.write(line)
                        continue
                    out.write(line)
                    n += 1
            if remove:
                os.remove(p)
    return n
