"""Independent scalar Bowtie2-semantics oracle.

Numpy-only model of Bowtie2's documented end-to-end and local alignment
semantics, developed against the bowtie2 manual and the reference's scoring
definitions (``/root/reference/nvBowtie/bowtie2/cuda/scoring.h:83-101``,
``mapq.h:146-263``) rather than against the pipeline: the validation the
reference performed externally vs real Bowtie2 (99.98% agreement,
``nvBowtie/nvBowtie.dox:40-50``), re-expressed as an in-repo executable
model. It imports nothing from nvbio_tpu; an exhaustive affine-gap DP over
the FULL genome (both strands) replaces seeds/bands/FM-indexes, so a
heuristic sensitivity failure, a scoring bug, or a mis-filled SAM field in
the mapper all surface as disagreements.

Checks provided (driven by tests/test_oracle.py):
  * mapped iff the exhaustive optimum clears Bowtie2's score-min function
  * AS equals the exhaustive optimum (the mapper found the true best)
  * the reported (POS, CIGAR, SEQ) re-scores to exactly AS against the
    genome, and NM/MD recomputed from the genome match the emitted tags
  * MAPQ equals a scalar re-derivation of the V2 table fed with the
    exhaustive distinct-locus second-best
  * PE: flag/RNEXT/PNEXT/TLEN cross-field consistency, YT classes, and
    proper-pair geometry (fr orientation, fragment within [minins, maxins])
"""

from __future__ import annotations

import re

import numpy as np

# Bowtie2 end-to-end defaults (bowtie2 manual: --mp MX,MN; --rdg / --rfg
# 5,3 => open = 5 + first-extend 3 = 8, extend = 3; --score-min L,-0.6,-0.6;
# --np 1 flat penalty at read-N positions; --n-ceil L,0,0.15)
MX, MN = 6, 2
NP = 1
GAP_OPEN, GAP_EXT = 8, 3
NEG = -(1 << 30)


def n_ceil(read_len: int, *, const=0.0, coeff=0.15) -> int:
    """bowtie2 --n-ceil: max read Ns before the read is filtered."""
    return int(const + coeff * read_len)

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
_CODE = {"A": 0, "C": 1, "G": 2, "T": 3}


def mm_penalty(q: int) -> int:
    """Quality-scaled mismatch penalty: MN + (MX-MN) * min(q,40)/40,
    truncated (bowtie2 scoring.cpp q-to-penalty; the reference's QualCost,
    ``scoring.h:83-101``, truncates the same way)."""
    return MN + ((MX - MN) * min(int(q), 40)) // 40


def score_min(read_len: int, *, const=-0.6, coeff=-0.6, log=False) -> int:
    """Bowtie2 --score-min function; e2e default L,-0.6,-0.6 (ceil'd to an
    achievable integer score), local default G,20,8."""
    x = np.log(max(read_len, 1)) if log else float(read_len)
    return int(np.ceil(const + coeff * x))


def revcomp_codes(codes: np.ndarray) -> np.ndarray:
    c = np.asarray(codes)
    return np.where(c > 3, c, 3 - c)[::-1]  # N (code 4) complements to N


def _sub_scores(read: np.ndarray, quals: np.ndarray, match_bonus: int):
    """(L, 4) substitution score table: +bonus on match, -pen(q) else;
    read-N rows (code > 3) never match and charge the flat --np penalty."""
    L = len(read)
    pen = np.array([mm_penalty(q) for q in quals], np.int64)
    pen = np.where(np.asarray(read) > 3, NP, pen)
    tab = np.full((L, 4), 0, np.int64) - pen[:, None]
    acgt = np.asarray(read) < 4
    tab[np.flatnonzero(acgt), np.asarray(read)[acgt]] = match_bonus
    return tab


def _scan_rows(genome: np.ndarray, read: np.ndarray, quals: np.ndarray,
               match_bonus: int):
    """One-strand exhaustive affine-gap DP (end-to-end).

    Returns ``end_scores``: ``end_scores[j]`` is the best score of a
    full-read alignment whose text span ends at position j (exclusive);
    the start position in the text is free (row 0 = 0 everywhere).

    The read-gap state E (consumes text) has an in-row dependence; it is
    vectorized with the classic slope trick:
        E[j] = max_{k<j} (Hd[k] - open - (j-1-k)*ext)
             = maxacc(Hd + k*ext)[j-1] - open - (j-1)*ext
    which is exact because a gap is never opened from a state that itself
    ends in a read-gap (extending dominates re-opening).
    """
    n = len(genome)
    sub = _sub_scores(read, quals, match_bonus)
    j_ext = np.arange(n + 1, dtype=np.int64) * GAP_EXT

    H = np.zeros(n + 1, np.int64)          # row 0: free start everywhere
    F = np.full(n + 1, NEG, np.int64)
    for i in range(len(read)):
        F = np.maximum(H - GAP_OPEN, F - GAP_EXT)
        diag = H[:-1] + sub[i][genome]
        Hd = F.copy()
        Hd[1:] = np.maximum(Hd[1:], diag)
        # read-gap state via running max of (Hd + k*ext)
        acc = np.maximum.accumulate(Hd + j_ext)
        H = Hd.copy()
        H[1:] = np.maximum(H[1:], acc[:-1] - GAP_OPEN - j_ext[1:] + GAP_EXT)
    return H


def best_alignments(genome: np.ndarray, read: np.ndarray, quals: np.ndarray,
                    *, mode="end-to-end", match_bonus=0,
                    same_locus_radius=34):
    """Exhaustive two-strand optimum + distinct-locus second best.

    Returns dict(best, strand, end, second): ``best`` is the global optimal
    alignment score over both strands and every genome position, ``second``
    the best score at a locus either on the other strand or farther than
    ``same_locus_radius`` text positions from the optimum's end (Bowtie2's
    XS notion — a *different* alignment locus, not a band-shifted rescore
    of the same one).
    """
    genome = np.asarray(genome, np.int64)
    read = np.asarray(read, np.int64)
    quals = np.asarray(quals, np.int64)
    scan = _local_end_scores if mode == "local" else _scan_rows
    rows = {0: scan(genome, read, quals, match_bonus),
            1: scan(genome, revcomp_codes(read), quals[::-1], match_bonus)}
    b0, b1 = int(rows[0].max()), int(rows[1].max())
    strand = 0 if b0 >= b1 else 1
    best = max(b0, b1)
    end = int(np.argmax(rows[strand]))
    mask = rows[strand].copy()
    lo = max(0, end - same_locus_radius)
    mask[lo:end + same_locus_radius + 1] = NEG
    second = max(int(mask.max()), int(rows[1 - strand].max()))
    return dict(best=best, strand=strand, end=end, second=second)


def _local_end_scores(genome, read, quals, match_bonus):
    """Per-end-position best LOCAL score (both read ends clippable)."""
    n = len(genome)
    sub = _sub_scores(np.asarray(read, np.int64),
                      np.asarray(quals, np.int64), match_bonus)
    j_ext = np.arange(n + 1, dtype=np.int64) * GAP_EXT
    H = np.zeros(n + 1, np.int64)
    F = np.full(n + 1, NEG, np.int64)
    out = np.zeros(n + 1, np.int64)
    genome = np.asarray(genome, np.int64)
    for i in range(len(read)):
        F = np.maximum(H - GAP_OPEN, F - GAP_EXT)
        diag = H[:-1] + sub[i][genome]
        Hd = F.copy()
        Hd[1:] = np.maximum(Hd[1:], diag)
        Hd = np.maximum(Hd, 0)
        acc = np.maximum.accumulate(Hd + j_ext)
        H = Hd.copy()
        H[1:] = np.maximum(H[1:], acc[:-1] - GAP_OPEN - j_ext[1:] + GAP_EXT)
        out = np.maximum(out, H)
    return out


# ---- record re-scoring ------------------------------------------------------

_CIG_RE = re.compile(r"(\d+)([MIDSH=X])")


def rescore_record(genome_str: str, rec, *, match_bonus=0):
    """Re-derive (score, NM, MD, end_pos) of the alignment a SAM record
    DESCRIBES, straight from the genome string + the record's SEQ/QUAL/POS/
    CIGAR (SAM semantics: SEQ is already reference-forward). Completely
    independent of how the record was produced."""
    ops = _CIG_RE.findall(rec.cigar)
    assert "".join(f"{n}{o}" for n, o in ops) == rec.cigar, rec.cigar
    g = rec.pos - 1            # 0-based ref cursor
    r = 0                      # read cursor
    score = 0
    nm = 0
    md_parts = []
    run = 0                    # current MD match-run length
    seq = rec.seq
    quals = [ord(c) - 33 for c in rec.qual] if rec.qual != "*" else None

    def qp(k):
        if seq[k] == "N":
            return NP  # flat --np penalty at read-N positions
        return mm_penalty(quals[k]) if quals is not None else MX

    for cnt, op in ops:
        cnt = int(cnt)
        if op in ("M", "=", "X"):
            for _ in range(cnt):
                if seq[r] == genome_str[g] and seq[r] != "N":
                    score += match_bonus
                    run += 1
                else:
                    score -= qp(r)
                    nm += 1
                    md_parts.append(str(run))
                    md_parts.append(genome_str[g])
                    run = 0
                g += 1
                r += 1
        elif op == "I":        # read-only bases (insertion to the ref)
            score -= GAP_OPEN + GAP_EXT * (cnt - 1)
            nm += cnt
            r += cnt
        elif op == "D":        # ref-only bases
            score -= GAP_OPEN + GAP_EXT * (cnt - 1)
            nm += cnt
            md_parts.append(str(run))
            md_parts.append("^" + genome_str[g:g + cnt])
            run = 0
            g += cnt
        elif op == "S":
            r += cnt           # soft clip: no score, no MD
        # H consumes neither
    md_parts.append(str(run))
    return score, nm, "".join(md_parts), g


# ---- MAPQ V2 (scalar re-derivation of mapq.h:146-263) -----------------------

def mapq_v2(best: int, second: int, has_second: bool,
            min_s: int, max_s: int = 0) -> int:
    """Scalar MAPQ V2. ``max_s`` = 0 for end-to-end (match bonus 0)."""
    if best < min_s:
        return 0
    diff = max(max_s - min_s, 1)
    bo = best - min_s
    if not has_second:
        for frac, q in ((0.8, 42), (0.7, 40), (0.6, 24), (0.5, 23),
                        (0.4, 8), (0.3, 3)):
            if bo >= diff * frac:
                return q
        return 0
    bd = abs(abs(best) - abs(second))
    perfect = bo == diff

    def tier(hi, f1, v1, f2, v2, v3):
        if perfect:
            return hi
        if bo >= diff * f1:
            return v1
        return v2 if bo >= diff * f2 else v3

    if bd >= diff * 0.9:
        return 39 if perfect else 33
    if bd >= diff * 0.8:
        return 38 if perfect else 27
    if bd >= diff * 0.7:
        return 37 if perfect else 26
    if bd >= diff * 0.6:
        return 36 if perfect else 22
    if bd >= diff * 0.5:
        return tier(35, 0.84, 25, 0.68, 16, 5)
    if bd >= diff * 0.4:
        return tier(34, 0.84, 21, 0.68, 14, 4)
    if bd >= diff * 0.3:
        return tier(32, 0.88, 18, 0.67, 15, 3)
    if bd >= diff * 0.2:
        return tier(31, 0.88, 17, 0.67, 11, 0)
    if bd >= diff * 0.1:
        return tier(30, 0.88, 12, 0.67, 7, 0)
    if bd > 0:
        return 6 if bo >= diff * 0.67 else 2
    return 1 if bo >= diff * 0.67 else 0


# ---- paired-end geometry ----------------------------------------------------

def expect_tlen(pos1: int, end1: int, pos2: int, end2: int):
    """Signed TLENs for a mapped pair (SAM spec: leftmost-start to
    rightmost-end; leftmost mate gets +, the other -; ``pos`` 1-based,
    ``end`` 1-based inclusive)."""
    left = min(pos1, pos2)
    right = max(end1, end2)
    t = right - left + 1
    t1 = t if pos1 <= pos2 else -t
    return t1, -t1


def is_proper_fr(pos_f: int, end_f: int, pos_r: int, end_r: int,
                 minins: int, maxins: int) -> bool:
    """Concordance under the default --fr policy: forward mate starts at or
    left of the reverse mate's end, fragment length within [-I, -X]."""
    frag = max(end_f, end_r) - min(pos_f, pos_r) + 1
    return pos_f <= end_r and minins <= frag <= maxins
