"""Index transforms: bisulfite (cmet), RNA-editing (atoi), SNP-tolerant.

Replaces cmetindex.c / atoiindex.c / snpindex.c.  Where the reference
transforms the stored oligos of an existing index (converting each
oligo and re-sorting positions, cmetindex.c:196-243), we rebuild the
index over the nucleotide-converted genome — identical results (the
converted oligo at position p equals the oligo at p of the converted
genome) with a far simpler dataflow.

Conversions (cmet.c / atoi.c semantics):
    metct: C -> T      metga: G -> A
    a2iag: A -> G      a2itc: T -> C
"""

from __future__ import annotations

import os

import numpy as np

from ..utils import dna
from . import genomecomp, indexdb
from .iit import IIT

CONVERSIONS = {
    "metct": (dna.C, dna.T),
    "metga": (dna.G, dna.A),
    "a2iag": (dna.A, dna.G),
    "a2itc": (dna.T, dna.C),
}


def convert_codes(codes: np.ndarray, conversion: str) -> np.ndarray:
    src, dst = CONVERSIONS[conversion]
    out = codes.copy()
    out[codes == src] = dst
    return out


def build_converted_index(
    codes: np.ndarray,
    flags: np.ndarray,
    chr_ends,
    conversion: str,
    k: int = 12,
    interval: int = 3,
):
    conv = convert_codes(codes, conversion)
    return indexdb.build_index(conv, flags, chr_ends, k, interval)


def write_converted_indexes(
    dbdir: str, dbname: str, codes, flags, chr_ends,
    kind: str, k: int = 12, basesize: int | None = None, interval: int = 3,
) -> None:
    """kind 'cmet' writes metct+metga; 'atoi' writes a2iag+a2itc
    (cmetindex.c:641-652 / atoiindex.c naming)."""
    if basesize is None:
        basesize = min(12, k)
    base = os.path.join(dbdir, dbname)
    names = ("metct", "metga") if kind == "cmet" else ("a2iag", "a2itc")
    for prefix in names:
        offsets, positions = build_converted_index(
            codes, flags, chr_ends, prefix, k, interval
        )
        if basesize == k:
            indexdb.write_offsets_flat(
                f"{base}.{prefix}{basesize:02d}{k:02d}{interval}offsetscomp", offsets
            )
        else:
            indexdb.write_offsets_gamma(
                f"{base}.{prefix}{basesize:02d}{k:02d}{interval}gammaptrs",
                f"{base}.{prefix}{basesize:02d}{k:02d}{interval}offsetscomp",
                offsets, basesize, k,
            )
        indexdb.write_positions(f"{base}.{prefix}{k:02d}{interval}positions", positions)


# ------------------------------------------------------------------ snpindex

def alt_genome_from_snps(codes: np.ndarray, snps_iit: IIT, chr_names, chr_starts):
    """Substitute minor alleles into a copy of the genome.

    SNP convention (snpindex.c:296-345): the IIT *type* string holds the
    two alleles (e.g. type "CG"); whichever matches the reference base
    is the major allele, the other is substituted.  IIT coords 1-based.
    """
    alt = codes.copy()
    name_to_idx = {n: i for i, n in enumerate(chr_names)}
    code_of = {"A": dna.A, "C": dna.C, "G": dna.G, "T": dna.T}
    for div in snps_iit.divs_in_file_order():
        if div == "":
            continue
        ci = name_to_idx.get(div)
        if ci is None:
            continue
        off = int(chr_starts[ci])
        for iv in snps_iit.intervals[div]:
            snptype = snps_iit.types[iv.type] if iv.type < len(snps_iit.types) else ""
            if len(snptype) != 2:
                continue
            pos = off + iv.low - 1
            if pos < 0 or pos >= len(alt):
                continue
            a0, a1 = snptype[0], snptype[1]
            if a0 in code_of and a1 in code_of:
                if alt[pos] == code_of[a0]:
                    alt[pos] = code_of[a1]
                elif alt[pos] == code_of[a1]:
                    alt[pos] = code_of[a0]
    return alt


def snp_kmer_pairs(codes, flags, chr_ends, snp_pos, snp_alt, k, interval):
    """Enumerate (oligo, position) pairs of SNP-substituted k-mers.

    Mirrors snpindex.c process_snp_block: SNPs within k of each other
    form a block; every allele combination except all-reference yields
    oligomers for each sampled window start covering >= 1 SNP.
    snp_pos: absolute 0-based positions; snp_alt: alt codes (or -1 = N,
    skipped since N never appears in an oligo).
    """
    import itertools

    chr_ends = np.asarray(chr_ends, dtype=np.int64)
    chr_starts = np.concatenate([[0], chr_ends[:-1]])
    order = np.argsort(snp_pos)
    snp_pos = np.asarray(snp_pos)[order]
    snp_alt = np.asarray(snp_alt)[order]
    n = len(codes)
    pairs = set()
    i = 0
    while i < len(snp_pos):
        j = i + 1
        while j < len(snp_pos) and snp_pos[j] < snp_pos[j - 1] + k:
            j += 1
        block = [(int(snp_pos[t]), int(snp_alt[t])) for t in range(i, j)
                 if snp_alt[t] >= 0]
        i = j
        if not block:
            continue
        ci = np.searchsorted(chr_ends, block[0][0], side="right")
        cs, ce = int(chr_starts[ci]), int(chr_ends[ci])
        lo = max(cs, block[0][0] - k + 1)
        hi = min(ce - k, block[-1][0])
        for s in range(lo, hi + 1):
            if (s - cs) % interval != 0:
                continue
            window = codes[s : s + k]
            if flags[s : s + k].any():
                continue
            inwin = [(p - s, a) for p, a in block if s <= p < s + k]
            if not inwin:
                continue
            # every non-empty subset substituted
            for r in range(1, len(inwin) + 1):
                for combo in itertools.combinations(inwin, r):
                    w = window.copy()
                    for off, a in combo:
                        w[off] = a
                    oligo = 0
                    for c in w:
                        oligo = (oligo << 2) | int(c)
                    pairs.add((oligo, s))
    return pairs


def write_snp_index(
    dbdir: str, dbname: str, snpsname: str,
    codes, flags, chr_ends, alt_codes,
    snp_pos=None, snp_alt=None,
    k: int = 12, basesize: int | None = None, interval: int = 3,
) -> None:
    """Write the SNP-tolerant index (snpindex.c): ref positions merged
    with SNP-substituted k-mer positions.  File naming appends the snps
    name: <db>.genomecomp.<snps>, <db>.ref<BB><KK><Q>offsetscomp.<snps>
    (+ gammaptrs when BB<KK), <db>.ref<KK><Q>positions.<snps>."""
    if basesize is None:
        basesize = min(12, k)
    base = os.path.join(dbdir, dbname)
    # the alt genomecomp marks every substituted position with the flag
    # bit (SNP marker, not an N) — snpindex.c behavior
    alt_flags = flags | (alt_codes != codes)
    genomecomp.write(f"{base}.genomecomp.{snpsname}", alt_codes, alt_flags)

    off_r, pos_r = indexdb.build_index(codes, flags, chr_ends, k, interval)

    if snp_pos is None:
        snp_pos = np.flatnonzero(alt_codes != codes)
        snp_alt = alt_codes[snp_pos]
    extra = snp_kmer_pairs(codes, flags, chr_ends, snp_pos, snp_alt, k, interval)

    def expand(off, pos):
        oligo = np.repeat(
            np.arange(len(off) - 1, dtype=np.int64), np.diff(off.astype(np.int64))
        )
        return oligo, pos.astype(np.int64)

    o_r, p_r = expand(off_r, pos_r)
    if extra:
        e = np.array(sorted(extra), dtype=np.int64)
        o = np.concatenate([o_r, e[:, 0]])
        p = np.concatenate([p_r, e[:, 1]])
    else:
        o, p = o_r, p_r
    order = np.lexsort((p, o))
    o, p = o[order], p[order]
    oligospace = 4 ** k
    counts = np.bincount(o, minlength=oligospace).astype(np.uint32)
    offsets = np.zeros(oligospace + 1, dtype=np.uint32)
    np.cumsum(counts, out=offsets[1:])
    positions = p.astype(np.uint32)

    if basesize == k:
        indexdb.write_offsets_flat(
            f"{base}.ref{basesize:02d}{k:02d}{interval}offsetscomp.{snpsname}", offsets
        )
    else:
        indexdb.write_offsets_gamma(
            f"{base}.ref{basesize:02d}{k:02d}{interval}gammaptrs.{snpsname}",
            f"{base}.ref{basesize:02d}{k:02d}{interval}offsetscomp.{snpsname}",
            offsets, basesize, k,
        )
    indexdb.write_positions(
        f"{base}.ref{k:02d}{interval}positions.{snpsname}", positions
    )
