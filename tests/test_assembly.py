"""De Bruijn micro-assembly tests (nvMicroAssembly equivalent).

Oracle pattern as in the reference's self-checking tests: graphs built from
tiny hand-checkable sequences, plus a haplotype-recovery end-to-end where
reads carrying a SNP must assemble into the variant haplotype.
"""

import numpy as np
import pytest

from nvbio_tpu.alphabet import codes_to_string, string_to_codes
from nvbio_tpu.assembly import (build_debruijn_graph, k_best_haplotypes,
                                load_active_regions)


def _dense(seqs, region_ids, is_ref, quals=None):
    L = max(len(s) for s in seqs)
    codes = np.full((len(seqs), L), 4, np.uint8)
    lengths = np.zeros(len(seqs), np.int32)
    q = np.full((len(seqs), L), 40, np.uint8)
    for i, s in enumerate(seqs):
        c = string_to_codes(s)
        codes[i, :len(c)] = c
        lengths[i] = len(c)
        if quals is not None and quals[i] is not None:
            q[i, :len(c)] = quals[i]
    return (codes, lengths, np.asarray(region_ids, np.int32),
            np.asarray(is_ref, bool), q)


def test_simple_linear_graph():
    # one sequence, k=3: ACGTA -> nodes ACG,CGT,GTA; edges ACG->CGT->GTA
    g = build_debruijn_graph(*_dense(["ACGTA"], [0], [True]), k=3)
    assert g.n_nodes == 3
    assert g.n_edges == 2
    assert not g.cycle_flags[0]
    assert g.kmer_string(int(g.source_ids[0])) == "ACG"
    assert g.kmer_string(int(g.sink_ids[0])) == "GTA"
    # every edge on the ref haplotype is ref-flagged with weight 1
    assert g.edge_ref_flags.all()
    np.testing.assert_allclose(g.edge_weights, 1.0)
    haps = k_best_haplotypes(g)
    assert len(haps[0]) == 1
    assert str(haps[0][0]) == "ACGTA"


def test_edge_multiplicities_and_weights():
    # ref A->B; two reads A->C: out of node A, count(B)=1 count(C)=2
    ref = "ACGT"   # k=3: ACG -> CGT
    rd = "ACGA"    # ACG -> CGA
    g = build_debruijn_graph(*_dense([ref, rd, rd], [0, 0, 0],
                                     [True, False, False]), k=3)
    acg = int(np.flatnonzero([g.kmer_string(i) == "ACG"
                              for i in range(g.n_nodes)])[0])
    sl = g.out_edges(acg)
    dsts = [g.kmer_string(int(v)) for v in g.adj[sl]]
    counts = dict(zip(dsts, g.edge_counts[sl].tolist()))
    weights = dict(zip(dsts, g.edge_weights[sl].tolist()))
    assert counts == {"CGA": 2, "CGT": 1}
    assert weights["CGA"] == pytest.approx(2 / 3)
    assert weights["CGT"] == pytest.approx(1 / 3)
    refflags = dict(zip(dsts, g.edge_ref_flags[sl].tolist()))
    assert refflags == {"CGA": False, "CGT": True}


def test_cycle_detection():
    # ACGACGACG with k=3 revisits ACG -> cycle
    g = build_debruijn_graph(*_dense(["ACGACGACG"], [0], [True]), k=3)
    assert g.cycle_flags[0]
    assert k_best_haplotypes(g)[0] == []
    # acyclic region in the same batch is still assembled
    g2 = build_debruijn_graph(*_dense(["ACGACGACG", "TTACGTT"], [0, 1],
                                      [True, True]), k=3)
    assert g2.cycle_flags[0] and not g2.cycle_flags[1]
    haps = k_best_haplotypes(g2)
    assert haps[0] == [] and str(haps[1][0]) == "TTACGTT"


def test_low_quality_kmers_excluded():
    ref = "ACGTACGG"
    rd = "ACGTACGG"
    quals = [None, np.array([40, 40, 2, 40, 40, 40, 40, 40], np.uint8)]
    g = build_debruijn_graph(*_dense([ref, rd], [0, 0], [True, False],
                                     quals=quals), k=4, min_qual=6)
    # read k-mers covering the q=2 base contribute nothing: all edge counts 1
    assert (g.edge_counts[g.edge_ref_flags] <= 2).all()
    low_cov = g.edge_counts.max()
    g_hi = build_debruijn_graph(*_dense([ref, rd], [0, 0], [True, False]),
                                k=4, min_qual=6)
    assert g_hi.edge_counts.max() > low_cov or g_hi.n_edges == g.n_edges


def test_snp_haplotype_recovery():
    rng = np.random.default_rng(5)
    region = codes_to_string(rng.integers(0, 4, 120, np.uint8))
    # variant haplotype: SNP at position 60
    alt = "ACGT"[("ACGT".index(region[60]) + 1) % 4]
    var = region[:60] + alt + region[61:]
    reads = [var[s:s + 40] for s in range(0, 81, 5)]  # tile the variant
    seqs = [region] + reads
    g = build_debruijn_graph(
        *_dense(seqs, [0] * len(seqs), [True] + [False] * len(reads)), k=15)
    assert not g.cycle_flags[0]
    haps = k_best_haplotypes(g, k_best=4)[0]
    seqs_out = {str(h) for h in haps}
    assert var in seqs_out          # variant recovered
    assert region in seqs_out       # reference path still present
    # variant path outweighs the ref path (every read supports ALT)
    best = max(haps, key=lambda h: h.score)
    assert str(best) == var


def test_region_loader(tmp_path):
    from nvbio_tpu.io.reference import Reference
    from nvbio_tpu.io.sam import SamRecord, SamWriter

    rng = np.random.default_rng(9)
    seq = codes_to_string(rng.integers(0, 4, 600, np.uint8))
    fa = tmp_path / "r.fa"
    fa.write_text(f">c1\n{seq}\n")
    sam = str(tmp_path / "a.sam")
    with SamWriter(sam, ["c1"], [600]) as w:
        for pos in (10, 50, 90, 260, 300):
            w.write(SamRecord(f"r{pos}", 0, "c1", pos + 1, 60, "40M",
                              seq[pos:pos + 40], "I" * 40))
    ref = Reference.from_fasta(str(fa))
    regions, codes, lengths, region_ids, is_ref, quals = load_active_regions(
        sam, ref, n_regions=2, region_size=200)
    assert len(regions) == 2
    assert regions[0].n_reads == 3 and regions[1].n_reads == 2
    # row 0 of each region is the reference haplotype
    r0 = np.flatnonzero((region_ids == 0) & is_ref)
    assert len(r0) == 1 and lengths[r0[0]] == 200
    assert codes_to_string(codes[r0[0], :200]) == seq[:200]
    # reads spanning a region boundary appear in both regions
    g = build_debruijn_graph(codes, lengths, region_ids, is_ref, k=15,
                             quals=quals)
    haps = k_best_haplotypes(g)
    assert str(haps[0][0]) == seq[:200]
    assert str(haps[1][0]) == seq[200:400]


def test_cli_assemble(tmp_path):
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(21)
    seq = codes_to_string(rng.integers(0, 4, 400, np.uint8))
    (tmp_path / "r.fa").write_text(f">c1\n{seq}\n")
    from nvbio_tpu.io.sam import SamRecord, SamWriter

    with SamWriter(str(tmp_path / "a.sam"), ["c1"], [400]) as w:
        for pos in range(0, 160, 10):
            w.write(SamRecord(f"r{pos}", 0, "c1", pos + 1, 60, "40M",
                              seq[pos:pos + 40], "I" * 40))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from tests.conftest import cpu_subprocess_env

    env = cpu_subprocess_env(repo)
    r = subprocess.run(
        [sys.executable, "-m", "nvbio_tpu", "assemble", "r.fa", "a.sam",
         "--regions", "1", "--region-size", "200", "-o", "h.fa"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    out = (tmp_path / "h.fa").read_text().splitlines()
    assert out[0].startswith(">region0_1-200_hap0")
    assert out[1] == seq[:200]


def test_haplotype_support_votes():
    """Trie-dictionary k-mer voting assigns reads to the haplotype they
    came from (SNP region, two haplotypes)."""
    from nvbio_tpu.assembly import haplotype_support

    rng = np.random.default_rng(11)
    ref = rng.integers(0, 4, size=120, dtype=np.uint8)
    alt = ref.copy()
    alt[60] = (alt[60] + 2) % 4
    # 4 reads from ref haplotype, 4 from alt, all covering the SNP
    seqs, is_ref_flags = [codes_to_string(ref)], [True]
    truth = []
    for i in range(8):
        src = ref if i % 2 == 0 else alt
        s = int(rng.integers(20, 40))
        seqs.append(codes_to_string(src[s:s + 60]))
        is_ref_flags.append(False)
        truth.append(i % 2)
    dense = _dense(seqs, [0] * len(seqs), is_ref_flags)
    g = build_debruijn_graph(*dense, k=15)
    haps = k_best_haplotypes(g, 4)
    assert len(haps[0]) >= 2
    hap_strs = [str(h) for h in haps[0]]
    assert codes_to_string(ref) in hap_strs
    assert codes_to_string(alt) in hap_strs
    codes, lengths, region_ids, is_ref_arr = dense[:4]
    supp = haplotype_support(haps, codes, lengths, region_ids, is_ref_arr,
                             k=10)
    s0 = supp[0]
    assert s0 is not None and s0.n_reads == 8
    # every read's best haplotype contains its source sequence
    ref_id = hap_strs.index(codes_to_string(ref))
    alt_id = hap_strs.index(codes_to_string(alt))
    for i, t in enumerate(truth):
        want = ref_id if t == 0 else alt_id
        assert s0.best_hap[i] == want, (i, t, s0.votes[i])
    assert int(s0.support[ref_id]) == 4 and int(s0.support[alt_id]) == 4
