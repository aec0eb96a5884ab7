"""GMAP: cDNA/EST-to-genome spliced alignment.

A re-design of the reference's three-stage pipeline (stage1.c gregion
finding, stage2.c chained anchoring, stage3.c gap refinement) around
batched array ops:

  1. SEED   — sampled query k-mers against the global positional index;
              hits vote for diagonals (like GSNAP seeding, but many
              diagonals per query: one per exon).
  2. CHAIN  — diagonal segments ordered by query position are chained
              with intron-aware gap penalties (the sparse DP of
              stage2.c:2921 align_compute_scores, collapsed to segment
              granularity).
  3. BRIDGE — each inter-segment junction is resolved exactly like
              dynprog.c:3291 bridge_intron_gap: scan candidate splice
              points scoring left matches + intron dinucleotide bonus
              (GT-AG/GC-AG/AT-AC by cDNA direction, constants from
              dynprog.c:142-300) + right matches; pure-indel junctions
              fall back to a banded affine DP.
  4. ENDS   — extend to the query ends and trim like stage3.c end
              refinement.

The result is a Path: aligned exon list + per-column pairs, from which
all GMAP output formats derive.  Scoring constants mirror dynprog.c so
boundary choices match the reference on its golden fixtures.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..db.datadir import GenomeDB
from ..ops import maxent
from ..utils import dna

# dynprog.c:142-300 scoring constants (HIGHQ tier; defect_rate < 0.003)
FULLMATCH = 3
MISMATCH_HIGHQ = -3
SINGLE_OPEN = -10
SINGLE_EXTEND = -3
CANONICAL_INTRON_HIGHQ = 10
FINAL_CANONICAL_INTRON_HIGHQ = 30
GCAG_INTRON = 15
FINAL_GCAG_INTRON = 20
ATAC_INTRON = 12
FINAL_ATAC_INTRON = 12
MIN_INTRONLENGTH = 9
MAX_INSERTLEN = 30  # largest query insertion the chainer bridges

# intron dinucleotide codes (dinucleotide pairs as (left, right) strings)
_CANONICAL = {
    # cdna_direction > 0 (sense): left=donor start, right=acceptor end
    +1: {("GT", "AG"): "canonical", ("GC", "AG"): "gcag", ("AT", "AC"): "atac"},
    # cdna_direction < 0 (antisense on plus genome)
    -1: {("CT", "AC"): "canonical", ("CT", "GC"): "gcag", ("GT", "AT"): "atac"},
}


def intron_score(left_dinucl: str, right_dinucl: str, cdna_direction: int,
                 canonical_reward: int, finalp: bool) -> tuple[int, str]:
    """dynprog.c intron_score: bonus for canonical intron dinucleotides."""
    for direction in ([cdna_direction] if cdna_direction else [+1, -1]):
        kind = _CANONICAL.get(direction, {}).get((left_dinucl, right_dinucl))
        if kind == "canonical":
            return canonical_reward, "canonical"
        if kind == "gcag":
            return (FINAL_GCAG_INTRON if finalp else GCAG_INTRON), "gcag"
        if kind == "atac":
            return (FINAL_ATAC_INTRON if finalp else ATAC_INTRON), "atac"
    return 0, "noncanonical"


@dataclass
class Exon:
    qstart: int   # query coords [qstart, qend) 0-based
    qend: int
    gstart: int   # universal genome coords [gstart, gend) of plus strand
    gend: int
    matches: int = 0
    mismatches: int = 0


@dataclass
class Path:
    watsonp: bool               # query aligns to plus strand of genome
    cdna_direction: int         # +1 sense (GT-AG), -1 antisense, 0 unknown
    exons: list[Exon] = field(default_factory=list)
    # per-junction info between consecutive exons
    intron_types: list[str] = field(default_factory=list)
    querylength: int = 0
    indels: int = 0
    chrnum: int = 0

    @property
    def matches(self):
        return sum(e.matches for e in self.exons)

    @property
    def mismatches(self):
        return sum(e.mismatches for e in self.exons)

    @property
    def qstart(self):
        return self.exons[0].qstart if self.exons else 0

    @property
    def qend(self):
        return self.exons[-1].qend if self.exons else 0

    @property
    def gstart(self):
        return self.exons[0].gstart if self.exons else 0

    @property
    def gend(self):
        return self.exons[-1].gend if self.exons else 0

    def coverage(self) -> float:
        return 100.0 * (self.qend - self.qstart) / max(1, self.querylength)

    def identity(self) -> float:
        aligned = self.matches + self.mismatches + self.indels
        return 100.0 * self.matches / max(1, aligned)


# --------------------------------------------------------------------- seeding

def _kmer_hits(db: GenomeDB, qcodes: np.ndarray, qflags: np.ndarray, step: int = 1):
    """All (qpos, genomepos) hits of query k-mers via the global index.

    step=1 is required for full sensitivity: the index samples genome
    positions every ``interval`` (3), so a fixed query-side sampling
    phase would miss exons whose diagonal is in a different phase.
    Returns arrays (qpos int64[N], gpos int64[N])."""
    k = db.k
    n = len(qcodes) - k + 1
    if n <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    oligos = dna.pack_kmers(qcodes, k)
    bad = np.convolve(qflags.astype(int), np.ones(k, int), "valid") > 0
    qq, gg = [], []
    offsets, positions = db.offsets, db.positions
    for qp in range(0, n, step):
        if bad[qp]:
            continue
        o = int(oligos[qp])
        s, e = int(offsets[o]), int(offsets[o + 1])
        if e - s == 0 or e - s > 100:
            continue
        p = positions[s:e].astype(np.int64)
        qq.append(np.full(len(p), qp, np.int64))
        gg.append(p)
    if not qq:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(qq), np.concatenate(gg)


def _segments_from_hits(qpos, gpos, k: int, max_diag_spread: int = 6):
    """Group hits into diagonal segments: runs with (nearly) constant
    diagonal and increasing query position.  Returns a list of
    (qstart, qend, gstart, diag) with qend exclusive of the k-mer end."""
    if len(qpos) == 0:
        return []
    diag = gpos - qpos
    order = np.lexsort((qpos, diag))
    qpos, gpos, diag = qpos[order], gpos[order], diag[order]
    segs = []
    i = 0
    n = len(qpos)
    while i < n:
        j = i + 1
        while j < n and diag[j] == diag[i] and qpos[j] - qpos[j - 1] <= 2 * k:
            j += 1
        qs, qe = int(qpos[i]), int(qpos[j - 1]) + k
        segs.append((qs, qe, int(gpos[i]), int(diag[i])))
        i = j
    return segs


def _chain_segments(segs, k: int = 12, max_intronlen: int = 1_000_000,
                    min_seglen: int = 15):
    """Chain diagonal segments by query order with genomic colinearity.

    Scoring follows the spirit of stage2.c:1243 score_querypos_general:
    gain = covered query length; transitions pay a query-distance
    penalty plus an intron-open penalty for genomic jumps (NINTRON-like),
    which keeps repeat-noise diagonals out of the chain.  O(S^2) DP.
    """
    segs = [s for s in segs if s[1] - s[0] >= min_seglen]
    if not segs:
        return []
    segs = sorted(segs, key=lambda s: (s[0], s[2]))
    n = len(segs)
    score = np.full(n, -1e18)
    prev = np.full(n, -1)
    for i in range(n):
        qs, qe, gs, d = segs[i]
        seglen = qe - qs
        score[i] = seglen  # chain start
        for j in range(i):
            qs2, qe2, gs2, d2 = segs[j]
            if (d - d2) > max_intronlen or (d2 - d) > MAX_INSERTLEN:
                continue  # bound intron size; small negative steps = insertions
            qgap = qs - qe2
            if qgap < -k:
                continue  # too much query overlap
            gain = seglen + min(qgap, 0)  # overlap doesn't count twice
            gd = d - d2
            penalty = max(qgap, 0)
            if gd > 0:
                penalty += 25 if gd >= MIN_INTRONLENGTH else 12  # intron/indel open
            elif gd < 0:
                penalty += 12  # insertion open
            cand = score[j] + gain - penalty
            if cand > score[i]:
                score[i] = cand
                prev[i] = j
    best = int(np.argmax(score))
    chain = []
    while best >= 0:
        chain.append(segs[best])
        best = int(prev[best])
    return chain[::-1]


# --------------------------------------------------------------- gap bridging

def _bridge_intron(gstr, qstr, qL_end, qR_start, diagL, diagR,
                   cdna_direction, finalp=True):
    """Choose the splice point between two exon segments.

    Left exon currently covers query ..qL_end (exclusive) on diagonal
    diagL; right exon covers qR_start.. on diagR (diagR > diagL).
    Scans candidate split points r (query coordinate where the intron
    sits) over a peeled window, scoring exact matches on both sides +
    intron dinucleotide bonus, like bridge_intron_gap
    (dynprog.c:3291-3600, use_probabilities_p false).

    Returns (r, score, introntype, left_prob, right_prob).
    """
    peel = 11  # maxpeelback (gsnap.c:96, gmap.c default 11)
    lo = max(0, min(qL_end, qR_start) - peel)
    hi = min(len(qstr), max(qL_end, qR_start) + peel)
    canonical_reward = (
        FINAL_CANONICAL_INTRON_HIGHQ if finalp else CANONICAL_INTRON_HIGHQ
    )

    best = None
    for r in range(lo, hi + 1):
        # left side: query [lo, r) on diagL; right side: query [r, hi) on diagR
        scoreL = 0
        for q in range(lo, r):
            g = diagL + q
            scoreL += FULLMATCH if (0 <= g < len(gstr) and qstr[q] == gstr[g]) else MISMATCH_HIGHQ
        scoreR = 0
        for q in range(r, hi):
            g = diagR + q
            scoreR += FULLMATCH if (0 <= g < len(gstr) and qstr[q] == gstr[g]) else MISMATCH_HIGHQ
        gl = diagL + r       # first intron base (donor side)
        gr = diagR + r - 1   # last intron base (acceptor side)
        left_dinucl = gstr[gl : gl + 2]
        right_dinucl = gstr[gr - 1 : gr + 1]
        scoreI, introntype = intron_score(
            left_dinucl, right_dinucl, cdna_direction, canonical_reward, finalp
        )
        total = scoreL + scoreI + scoreR
        if best is None or total > best[1]:
            best = (r, total, introntype)
    r, _, introntype = best
    return r, best[1], introntype


def _solve_indel_junction(gstr, qstr, qL_end, qR_start, diagL, diagR):
    """Small genomic/cDNA indel between segments: pick the split point r
    maximizing exact matches on both diagonals (banded-DP equivalent for
    a single indel; dynprog.c Dynprog_single_gap semantics).  For
    insertions (diagR < diagL) the nins query bases [r, r+nins) are
    unaligned and the right side resumes at r + nins."""
    peel = 11
    nins = max(0, diagL - diagR)
    lo = max(0, min(qL_end, qR_start) - peel)
    hi = min(len(qstr) - nins, max(qL_end, qR_start) + peel)
    best = None
    for r in range(lo, hi + 1):
        score = 0
        for q in range(lo, r):
            g = diagL + q
            score += FULLMATCH if (0 <= g < len(gstr) and qstr[q] == gstr[g]) else MISMATCH_HIGHQ
        for q in range(r + nins, hi + nins):
            g = diagR + q
            score += FULLMATCH if (0 <= g < len(gstr) and qstr[q] == gstr[g]) else MISMATCH_HIGHQ
        if best is None or score > best[1]:
            best = (r, score)
    return best[0]


# ------------------------------------------------------------------- pipeline

def _count_matches(gstr, qstr, qs, qe, diag):
    m = mm = 0
    for q in range(qs, qe):
        g = diag + q
        if 0 <= g < len(gstr) and qstr[q] == gstr[g]:
            m += 1
        else:
            mm += 1
    return m, mm


def _extend_end(gstr, qstr, qpos, diag, direction, trim_mismatch_score=-3,
                ties_extend: bool = True):
    """Extend from qpos to the query end (direction=+1) or start (-1),
    then trim by match/mismatch score (changepoint-like end trimming).
    ties_extend=False keeps the SHORTER extension on score ties (the
    dynprog end BEST_LOCAL behavior)."""
    L = len(qstr)
    best_score = 0
    best_q = qpos
    score = 0
    q = qpos
    while (q < L) if direction > 0 else (q >= 0):
        g = diag + q
        if 0 <= g < len(gstr) and qstr[q] == gstr[g]:
            score += 1
        else:
            score += trim_mismatch_score
        if score > best_score or (ties_extend and score == best_score):
            best_score = score
            best_q = q + (1 if direction > 0 else 0)
        q += direction
    return best_q


def align_cdna(db: GenomeDB, query: str, max_intronlen: int = 1_000_000,
               extend_ends: bool = False):
    """Align a cDNA query; returns the best Path or None.

    extend_ends: extend the outer exons to the query bounds without
    trimming (the QUERYEND_NOGAPS end policy used when GSNAP invokes
    GMAP for rescue, stage1hr.c align_single_hit_with_gmap)."""
    genome_str = db.genome_str
    paths = []
    for watsonp in (True, False):
        qstr = query.upper() if watsonp else dna.revcomp_str(query.upper())
        qcodes, qflags = dna.encode(qstr)
        qpos, gpos = _kmer_hits(db, qcodes, qflags)
        segs = _segments_from_hits(qpos, gpos, db.k)
        chain = _chain_segments(segs, db.k, max_intronlen)
        if not chain:
            continue
        path = _build_path(genome_str, qstr, chain, watsonp, db)
        if path is not None:
            if extend_ends:
                _extend_path_to_ends(genome_str, qstr, path)
            paths.append(path)
    if not paths:
        return None
    paths.sort(key=lambda p: -(p.matches - 3 * p.mismatches))
    return paths[0]


def chop_path_ends(gstr: str, qstr: str, path: Path) -> None:
    """GMAP's changepoint end trimming (chop_ends_by_changepoint,
    stage3.c:2130): chop alignment ends whose match rate drops sharply
    below the interior rate."""
    from .changepoint import chop_ends

    cols = []  # (exon_index, qpos, match)
    for ei, e in enumerate(path.exons):
        diag = e.gstart - e.qstart
        for q in range(e.qstart, e.qend):
            g = diag + q
            m = 1 if (0 <= g < len(gstr) and qstr[q] == gstr[g]) else 0
            cols.append((ei, q, m))
    if not cols:
        return
    chop_l, chop_r = chop_ends([c[2] for c in cols])
    if chop_l == 0 and chop_r == 0:
        return
    kept = cols[chop_l : len(cols) - chop_r if chop_r else len(cols)]
    if not kept:
        return
    new_exons = []
    for ei, e in enumerate(path.exons):
        qs = [q for (i, q, _) in kept if i == ei]
        if not qs:
            continue
        diag = e.gstart - e.qstart
        lo, hi = qs[0], qs[-1] + 1
        m, mm = _count_matches(gstr, qstr, lo, hi, diag)
        new_exons.append(Exon(lo, hi, diag + lo, diag + hi, m, mm))
    path.exons = new_exons


def _extend_path_to_ends(gstr: str, qstr: str, path: Path) -> None:
    """Re-extend the outer exons with the GMAP end-dynprog scoring
    (BEST_LOCAL, FULLMATCH +3 / MISMATCH -3, dynprog.c:140-150): a
    mismatch followed by a match still extends, unlike the GSNAP
    +1/-3 trim policy."""
    first = path.exons[0]
    diag = first.gstart - first.qstart
    newq = _extend_end(gstr, qstr, first.qstart, diag, -1,
                       trim_mismatch_score=-1, ties_extend=False)
    if newq < first.qstart:
        m, mm = _count_matches(gstr, qstr, newq, first.qstart, diag)
        first.qstart = newq
        first.gstart = diag + newq
        first.matches += m
        first.mismatches += mm
    last = path.exons[-1]
    diag = last.gstart - last.qstart
    newq = _extend_end(gstr, qstr, last.qend, diag, +1,
                       trim_mismatch_score=-1, ties_extend=False)
    if newq > last.qend:
        m, mm = _count_matches(gstr, qstr, last.qend, newq, diag)
        last.qend = newq
        last.gend = diag + newq
        last.matches += m
        last.mismatches += mm


def _build_path(gstr, qstr, chain, watsonp, db) -> Path | None:
    L = len(qstr)
    # merge chained segments into exons, resolving junctions
    # first: collapse segments on the same diagonal
    merged = []
    for qs, qe, gs, d in chain:
        if merged and merged[-1][3] == d:
            merged[-1] = (merged[-1][0], qe, merged[-1][2], d)
        else:
            merged.append((qs, qe, gs, d))

    # direction vote: count canonical GT-AG vs CT-AC across junctions
    def junction_dinucls(r, diagL, diagR):
        gl = diagL + r
        gr = diagR + r - 1
        return gstr[gl : gl + 2], gstr[gr - 1 : gr + 1]

    # try both directions, pick the one with more canonical introns
    best_path = None
    for cdna_direction in (+1, -1):
        exon_bounds = []  # (qstart, qend, diag)
        ok = True
        prev_split = _extend_end(gstr, qstr, merged[0][0], merged[0][3], -1)
        for i in range(len(merged) - 1):
            qsL, qeL, gsL, dL = merged[i]
            qsR, qeR, gsR, dR = merged[i + 1]
            gap = dR - dL
            if gap >= MIN_INTRONLENGTH:
                r, _, introntype = _bridge_intron(
                    gstr, qstr, qeL, qsR, dL, dR, cdna_direction
                )
            else:
                r = _solve_indel_junction(gstr, qstr, qeL, qsR, dL, dR)
                introntype = "indel"
            exon_bounds.append((prev_split, r, dL, introntype))
            # insertion (dR < dL): the inserted query bases [r, r+nins)
            # are unaligned; the right exon resumes at r + nins so the
            # genome stays contiguous
            prev_split = r + (dL - dR) if gap < 0 else r
        last_end = _extend_end(gstr, qstr, merged[-1][1], merged[-1][3], +1)
        exon_bounds.append((prev_split, last_end, merged[-1][3], None))

        exons = []
        intron_types = []
        indels = 0
        prev = None
        for qs, qe, d, itype in exon_bounds:
            if qe <= qs:
                ok = False
                break
            m, mm = _count_matches(gstr, qstr, qs, qe, d)
            if prev is not None and prev[1] == d and itype is None:
                pass
            if exons and exons[-1].gend - exons[-1].gstart >= 0 and d == (
                exons[-1].gstart - exons[-1].qstart
            ):
                # same diagonal continuation (indel junction resolved to 0)
                exons[-1].qend = qe
                exons[-1].gend = d + qe
                exons[-1].matches += m
                exons[-1].mismatches += mm
                if intron_types and intron_types[-1] == "indel":
                    intron_types.pop()
            else:
                exons.append(Exon(qs, qe, d + qs, d + qe, m, mm))
                if itype is not None and len(exons) > 1:
                    pass
            prev = (qs, d)
        if not ok or not exons:
            continue
        # record junction types between final exons
        intron_types = []
        for i in range(len(exons) - 1):
            gl = exons[i].gend
            gr = exons[i + 1].gstart - 1
            left_dinucl = gstr[gl : gl + 2]
            right_dinucl = gstr[gr - 1 : gr + 1]
            _, itype = intron_score(left_dinucl, right_dinucl, cdna_direction, 1, True)
            intron_types.append(itype)

        ncanonical = sum(1 for t in intron_types if t == "canonical")
        path = Path(
            watsonp=watsonp,
            cdna_direction=cdna_direction,
            exons=exons,
            intron_types=intron_types,
            querylength=L,
        )
        key = (ncanonical, path.matches)
        if best_path is None or key > best_path[0]:
            best_path = (key, path)

    return best_path[1] if best_path else None
