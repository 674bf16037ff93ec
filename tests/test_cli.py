"""CLI app tests (index / map / aln-diff) via the module entry point."""

import os
import subprocess
import sys

import numpy as np
import pytest

from nvbio_tpu.alphabet import Alphabet, codes_to_string

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    from tests.conftest import cpu_subprocess_env

    env = cpu_subprocess_env(REPO)
    return subprocess.run(
        [sys.executable, "-m", "nvbio_tpu", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=1200,
    )


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=8000, dtype=np.uint8)
    seq = codes_to_string(codes, Alphabet.DNA)
    (d / "ref.fa").write_text(f">c1\n{seq}\n")
    L = 60
    lines = []
    for i in range(12):
        p = int(rng.integers(0, 8000 - L))
        lines.append(f"@r{i}_{p}\n{seq[p:p+L]}\n+\n{'I'*L}\n")
    (d / "reads.fq").write_text("".join(lines))
    return d


def test_cli_index_map_diff(dataset):
    r = _run(["index", "ref.fa", "idx", "-q", "10"], dataset)
    assert r.returncode == 0, r.stderr
    assert (dataset / "idx.ref.npz").exists()
    assert (dataset / "idx.qgram.npz").exists()

    r = _run(
        ["map", "idx", "reads.fq", "-o", "out.sam", "--max-read-len", "60",
         "--seed-len", "16", "--seed-stride", "10", "--batch", "64",
         "--max-dist", "4"],
        dataset,
    )
    assert r.returncode == 0, r.stderr
    sam = (dataset / "out.sam").read_text().splitlines()
    body = [l for l in sam if not l.startswith("@")]
    assert len(body) == 12
    for line in body:
        f = line.split("\t")
        name_pos = int(f[0].split("_")[1])
        assert not int(f[1]) & 0x4
        assert int(f[3]) - 1 == name_pos

    r = _run(["aln-diff", "out.sam", "out.sam", "--json"], dataset)
    assert r.returncode == 0, r.stderr
    import json

    stats = json.loads(r.stdout)
    assert stats["same_pos"] == stats["both_mapped"] == 12


def test_cli_map_bam_output(dataset):
    r = _run(["index", "ref.fa", "idxb", "-q", "10"], dataset)
    assert r.returncode == 0, r.stderr
    r = _run(
        ["map", "idxb", "reads.fq", "-o", "out.bam", "--max-read-len", "60",
         "--seed-len", "16", "--seed-stride", "10", "--batch", "64",
         "--max-dist", "4"],
        dataset,
    )
    assert r.returncode == 0, r.stderr
    from nvbio_tpu.io.bam import read_bam

    header, recs = read_bam(str(dataset / "out.bam"))
    assert any(h.startswith("@SQ") for h in header)
    assert len(recs) == 12
    for f in recs:
        assert int(f[3]) - 1 == int(f[0].split("_")[1])

    # aln-diff reads BAM directly and must agree with the SAM twin
    r = _run(["aln-diff", "out.bam", "out.bam", "--json"], dataset)
    assert r.returncode == 0, r.stderr
    import json

    stats = json.loads(r.stdout)
    assert stats["same_pos"] == stats["both_mapped"] == 12


def test_gauge_batch_halving():
    """Batch-size gauging backs off on device OOM (compute_thread.cu:121-143
    failure-recovery analogue)."""
    import numpy as np

    from nvbio_tpu.apps.map_app import gauge_batch_size

    class Fake:
        def dispatch(self, batch):
            if len(batch.names) > 128:
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory "
                                   "allocating 123 bytes")
            return {"mapped": np.zeros(len(batch.names), bool)}

    assert gauge_batch_size(Fake(), 1024, 100) == 128

    class Dead:
        def dispatch(self, batch):
            raise RuntimeError("RESOURCE_EXHAUSTED")

    import pytest
    with pytest.raises(RuntimeError):
        gauge_batch_size(Dead(), 128, 100)
