"""Shared-memory index serving (nvFM-server / mmap server equivalent).

The reference shares reference+FM-index across processes via POSIX shared
memory (``nvbio/basic/mmap.h``, ``nvFM-server.cpp``, SequenceDataMMAPServer).
The host-side equivalent here: artifacts exported as raw .npy files in a
directory and loaded with ``mmap_mode='r'`` — the OS page cache gives every
process on the host one physical copy; the device upload stays per-process
(one HBM copy per chip, which is the TPU analogue of per-GPU device copies).
"""

from __future__ import annotations

import json
import os

import numpy as np


def export_shared(dirpath: str, name: str, obj) -> None:
    """Export a Reference/FMIndex/QGramIndex as mmap-able raw arrays."""
    os.makedirs(dirpath, exist_ok=True)
    meta = {"name": name, "type": type(obj).__name__, "fields": {}, "scalars": {}}
    for f, v in vars(obj).items():
        if isinstance(v, np.ndarray):
            np.save(os.path.join(dirpath, f"{name}.{f}.npy"), v)
            meta["fields"][f] = f"{name}.{f}.npy"
        elif isinstance(v, (int, np.integer)):
            meta["scalars"][f] = int(v)
        elif isinstance(v, list):
            meta["scalars"][f] = v
    with open(os.path.join(dirpath, f"{name}.json"), "w") as fh:
        json.dump(meta, fh)


def load_shared(dirpath: str, name: str, cls):
    """Load an exported object with memory-mapped arrays (zero host copies)."""
    with open(os.path.join(dirpath, f"{name}.json")) as fh:
        meta = json.load(fh)
    kwargs = {}
    for f, fname in meta["fields"].items():
        kwargs[f] = np.load(os.path.join(dirpath, fname), mmap_mode="r")
    kwargs.update(meta["scalars"])
    return cls(**kwargs)
