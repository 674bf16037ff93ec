"""Multi-chip SPMD tests on the 8-device fake CPU mesh."""

import numpy as np

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert bool(np.asarray(out["mapped"]).all())


def test_sharded_matches_single_device():
    """Sharded execution must be bitwise identical to single-device."""
    import __graft_entry__ as ge
    import jax.numpy as jnp
    from nvbio_tpu.bowtie.pipeline import align_batch_core
    from nvbio_tpu.parallel.mesh import (
        make_reads_mesh, replicate, shard_batch, sharded_align_step,
    )

    fmi, gwords, n, reads, lens, quals, params = ge._tiny_problem(batch=32)
    single = align_batch_core(
        fmi, gwords, jnp.int32(n), jnp.asarray(reads), jnp.asarray(lens),
        jnp.asarray(quals), params,
    )

    mesh = make_reads_mesh(8)
    step = sharded_align_step(mesh, params)
    res, stats = step(
        replicate(mesh, fmi), replicate(mesh, gwords), jnp.int32(n),
        shard_batch(mesh, jnp.asarray(reads)),
        shard_batch(mesh, jnp.asarray(lens)),
        shard_batch(mesh, jnp.asarray(quals)),
    )
    np.testing.assert_array_equal(np.asarray(single["mapq"]), np.asarray(res["mapq"]))
    np.testing.assert_array_equal(
        np.asarray(single["window_start"]), np.asarray(res["window_start"])
    )
    assert int(stats["n_mapped"]) == int(np.asarray(single["mapped"]).sum())


def test_sharded_paired_matches_single_device():
    """PE SPMD step over 8 devices == unsharded align_paired_core."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nvbio_tpu.bowtie.paired import align_paired_core
    from nvbio_tpu.parallel.mesh import (
        make_reads_mesh,
        replicate,
        shard_batch,
        sharded_paired_step,
    )
    from __graft_entry__ import _tiny_problem

    B = 32
    fmi, gwords, n, reads, lens, quals, params = _tiny_problem(batch=B)
    rc = (3 - np.asarray(reads))[:, ::-1].astype(np.int32)

    args_np = (jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(quals),
               jnp.asarray(rc), jnp.asarray(lens), jnp.asarray(quals))
    ref1, ref2, refp = jax.jit(functools.partial(
        align_paired_core, params=params))(fmi, gwords, jnp.int32(n), *args_np)

    mesh = make_reads_mesh(8)
    step = sharded_paired_step(mesh, params)
    sh = [shard_batch(mesh, a) for a in args_np]
    got1, got2, gotp, stats = step(replicate(mesh, fmi),
                                   replicate(mesh, gwords),
                                   jnp.int32(n), *sh)
    assert int(stats["n_pairs"]) == B
    assert int(stats["n_proper"]) == int(np.asarray(refp["proper"]).sum())
    for k in ("mapped", "best_score", "mapq", "window_start", "nm"):
        np.testing.assert_array_equal(np.asarray(ref1[k]), np.asarray(got1[k]),
                                      err_msg=f"mate1 {k}")
        np.testing.assert_array_equal(np.asarray(ref2[k]), np.asarray(got2[k]),
                                      err_msg=f"mate2 {k}")


def test_dist_single_process_helpers(tmp_path):
    """Multi-host scaffolding degrades to single-process: striping keeps
    every batch, global_batch == shard_batch, SAM shards merge under one
    header."""
    from nvbio_tpu.parallel import dist
    from nvbio_tpu.parallel.mesh import make_reads_mesh

    assert dist.init_distributed() is False  # no coordinator -> local mode
    batches = list(range(7))
    assert list(dist.host_stripe(batches)) == batches
    # explicit 4-way striping (what each of 4 processes would keep)
    stripes = [list(dist.host_stripe(batches, p, 4)) for p in range(4)]
    assert sorted(sum(stripes, [])) == batches
    assert stripes[0] == [0, 4] and stripes[3] == [3]

    mesh = make_reads_mesh(min(8, len(jax.devices())))
    arr = np.arange(len(mesh.devices) * 3 * 2, dtype=np.int32).reshape(-1, 2)
    g = dist.global_batch(mesh, arr)
    np.testing.assert_array_equal(np.asarray(g), arr)

    # shard merge
    header = "@HD\tVN:1.6\n@SQ\tSN:chr1\tLN:100\n"
    p0, p1 = str(tmp_path / "o.sam.shard0000"), str(tmp_path / "o.sam.shard0001")
    with open(p0, "w") as f:
        f.write(header + "r0\t0\tchr1\t1\t42\t5M\t*\t0\t0\tACGTA\tIIIII\n")
    with open(p1, "w") as f:
        f.write(header + "r1\t0\tchr1\t9\t42\t5M\t*\t0\t0\tACGTA\tIIIII\n")
    out = str(tmp_path / "o.sam")
    n = dist.merge_sam_shards([p0, p1], out)
    assert n == 2
    lines = open(out).read().splitlines()
    assert sum(1 for l in lines if l.startswith("@")) == 2
    assert [l.split("\t")[0] for l in lines if not l.startswith("@")] == \
        ["r0", "r1"]
    assert dist.shard_path("x.sam", 7) == "x.sam.shard0007"
