"""GSNAP gapped extensions: middle indels + local (single) splicing.

Batched, static-shape re-design of the reference's stage-1hr gapped
stages:

  * middle insertions/deletions — solve_middle_insertion /
    solve_middle_deletion (stage1hr.c:4180, 4330): given two seeded
    diagonals dL < dR (deletion) or dL > dR (insertion), the split point
    is the lexicographically smallest (mismatch_sum, position) over the
    candidate set derived from per-diagonal mismatch positions, bounded
    by min_indel_end_matches (4).
  * local novel splicing — solve_singlesplice (stage1hr.c:6195) +
    find_singlesplices_plus (stage1hr.c:7235): candidate splice points
    are positions in [2, L-2] where segmenti carries a donor GT (sense)
    or antiacceptor CT, and segmentj carries an acceptor AG / antidonor
    AC two bases earlier; the winner maximizes maxent prob_i + prob_j
    (first maximum = smallest position) subject to the mismatch budget
    and sufficient_splice_prob_local (stage1hr.c:6093) support
    thresholds.

Everything here operates on the top-voted diagonals emitted by the
seeding stage of gsnap_se; diagonal pairs are selected per read with a
masked argsort (static MAXPAIRS shape), then all pair solvers run as
dense [B, P, L+1] scans — mismatch-prefix cumsums replace the
reference's Genome_mismatches_left/right streams, and splice-site
probabilities come from static-slice table lookups over a prefetched
local genome span (ops.maxent.splice_prob_span).

Hit kinds: 0 = substitution-only, 1 = insertion, 2 = deletion,
3 = splice.  Scores follow stage3hr: score = nmismatches + penalty
(indel_penalty_middle = 2, localsplicing_penalty = 0; gsnap.c:83-96).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops import genome as genome_ops
from ..ops import maxent
from ..ops import mismatch as mm_ops
from . import gsnap_se
from .gsnap_se import (
    BIG_NMM,
    INVALID_DIAG,
    GsnapParams,
    IndexArrays,
    _MODE_CONV,
    _convert_codes,
    _extract_oligos,
    _pack_device,
    _revcomp_batch,
    _seed_diagonals,
    _top_diagonals,
)

KIND_SUB = 0
KIND_INS = 1
KIND_DEL = 2
KIND_SPLICE = 3

INDEL_PENALTY_MIDDLE = 2       # gsnap.c:85
LOCALSPLICING_PENALTY = 0      # gsnap.c:90
MIN_INDEL_END_MATCHES = 4      # gsnap.c:88
MAX_MIDDLE_INSERTIONS = 9      # gsnap.c:86
MAX_MIDDLE_DELETIONS = 30      # gsnap.c:87
SHORTSPLICEDIST = 200_000      # gsnap.c:91
BIG_SCORE = jnp.int32(10**6)


@dataclass(frozen=True)
class GappedParams:
    """Static shape configuration for the gapped stages."""

    base: GsnapParams = GsnapParams()
    indel_pairs: int = 16      # diagonal pairs solved for indels per strand
    splice_pairs: int = 16     # diagonal pairs solved for splicing per strand
    novelsplicing: bool = False  # gsnap -N (novelsplicingp, default off)


# ------------------------------------------------------------- mismatch scans

def _prefix_mm(genome, queries, diags, lengths, conversion, alt):
    """Mismatch matrices + prefix sums for each candidate diagonal.

    diags uint32[B, NC] -> (mm bool[B, NC, L], pref int32[B, NC, L+1])
    where pref[..., s] = #mismatches of query[0:s] at that diagonal.
    Invalid diagonals produce all-mismatch rows.
    """
    b, nc = diags.shape
    lmax = queries.lmax
    glen = jnp.uint32(genome.length)
    ok = (diags != INVALID_DIAG) & (diags + lengths.astype(jnp.uint32)[:, None] <= glen)
    lefts = jnp.where(ok, diags, 0).reshape(-1)
    rep = lambda x: jnp.repeat(x, nc, axis=0)
    q = mm_ops.PackedQueries(
        codes16=rep(queries.codes16),
        nflags16=rep(queries.nflags16),
        length=rep(queries.length),
        lmax=lmax,
    )
    mm = mm_ops.mismatch_matrix(genome, q, lefts, conversion, alt).reshape(b, nc, lmax)
    idx = jnp.arange(lmax, dtype=jnp.int32)[None, None, :]
    inlen = idx < lengths[:, None, None]
    mm = (mm & inlen) | (~ok[:, :, None] & inlen)
    pref = jnp.concatenate(
        [jnp.zeros((b, nc, 1), jnp.int32), jnp.cumsum(mm, axis=2, dtype=jnp.int32)],
        axis=2,
    )
    return mm, pref


# ------------------------------------------------------------- pair selection

def _select_pairs(top_d, votes, mask_fn, maxpairs: int):
    """Choose up to ``maxpairs`` ordered diagonal pairs (i -> left part,
    j -> right part) per read, ranked by vote sum.

    mask_fn(di, dj) -> bool[B, NC, NC] eligibility.
    Returns (ii, jj, valid) each int32/bool[B, maxpairs]."""
    b, nc = top_d.shape
    di = top_d[:, :, None]
    dj = top_d[:, None, :]
    okd = (top_d != INVALID_DIAG)
    eligible = mask_fn(di, dj) & okd[:, :, None] & okd[:, None, :]
    score = votes[:, :, None] + votes[:, None, :]
    score = jnp.where(eligible, score, -1).reshape(b, nc * nc)
    order = jnp.argsort(-score, axis=1, stable=True)[:, :maxpairs]
    valid = jnp.take_along_axis(score.reshape(b, -1), order, axis=1) >= 0
    ii = (order // nc).astype(jnp.int32)
    jj = (order % nc).astype(jnp.int32)
    return ii, jj, valid


def _gather_pair(arr, idx):
    """arr [B, NC, ...] gathered at idx [B, P] -> [B, P, ...]."""
    extra = arr.ndim - 2
    ix = idx.reshape(idx.shape + (1,) * extra)
    ix = jnp.broadcast_to(ix, idx.shape + arr.shape[2:])
    return jnp.take_along_axis(arr, ix, axis=1)


# ----------------------------------------------------------------- indel solve

def _solve_indels(top_d, mm, pref, ii, jj, pvalid, lengths, budget, lmax: int):
    """Vectorized solve_middle_insertion/deletion.

    Returns dict of [B, P] arrays: valid, is_del, nindels, split (query
    position where part 2 begins on dL for deletions / where the
    inserted bases begin for insertions, i.e. the reference indel_pos),
    nmm1, nmm2, left (dL), right (dR).
    """
    b, p = ii.shape
    di = _gather_pair(top_d, ii)      # left-part diagonal  [B, P] uint32
    dj = _gather_pair(top_d, jj)      # right-part diagonal
    mm_i = _gather_pair(mm, ii)       # [B, P, L]
    mm_j = _gather_pair(mm, jj)
    pref_i = _gather_pair(pref, ii)   # [B, P, L+1]
    pref_j = _gather_pair(pref, jj)

    L = lengths[:, None]              # [B, 1]
    tot_j = jnp.take_along_axis(
        pref_j, L[:, :, None].astype(jnp.int32), axis=2
    )[:, :, 0][:, :, None]            # broadcastable total mismatches at dj

    ndel = (dj - di).astype(jnp.int32)   # >0 for deletions
    nins = (di - dj).astype(jnp.int32)   # >0 for insertions
    is_del = (ndel >= 1) & (ndel <= MAX_MIDDLE_DELETIONS)
    is_ins = (nins >= 1) & (nins <= MAX_MIDDLE_INSERTIONS)
    n = jnp.where(is_del, ndel, nins)[:, :, None]  # [B, P, 1]

    s = jnp.arange(lmax + 1, dtype=jnp.int32)[None, None, :]  # [1, 1, L+1]

    # suffix mismatch count of query[s':L] at dj, where s' = s (deletion)
    # or s + n (insertion)
    sfx_at = jnp.where(is_del[:, :, None], s, jnp.minimum(s + n, lmax))
    pref_j_at = jnp.take_along_axis(pref_j, sfx_at, axis=2)
    total = pref_i + (tot_j - pref_j_at)  # [B, P, L+1] mismatch sum per split

    # candidate splits (reference scans mismatch positions only):
    #   deletion:  s = mm_j position + 1, or s = mm_i position
    #   insertion: s = mm_j position - n + 1, or s = mm_i position
    pad_i = jnp.pad(mm_i, ((0, 0), (0, 0), (0, 1)))           # mm_i[s], s<L
    # mm_j at (s - 1) for deletion / (s + n - 1) for insertion
    mmj_at = jnp.take_along_axis(
        jnp.pad(mm_j, ((0, 0), (0, 0), (0, 1))),
        jnp.clip(jnp.where(is_del[:, :, None], s - 1, s + n - 1), 0, lmax),
        axis=2,
    )
    prev_ok = jnp.where(is_del[:, :, None], s >= 1, s + n - 1 >= 0)
    cand = pad_i.astype(bool) | (mmj_at.astype(bool) & prev_ok)

    # bounds: indel_pos in [4, L-4]; insertions also need s + n <= L - 4
    hi = jnp.where(is_del[:, :, None], L[:, :, None], L[:, :, None] - n)
    inb = (s >= MIN_INDEL_END_MATCHES) & (s <= hi - MIN_INDEL_END_MATCHES)

    key = jnp.where(cand & inb, total * 512 + s, BIG_SCORE)
    bestkey = jnp.min(key, axis=2)
    split = bestkey % 512
    best_sum = bestkey // 512

    valid = (
        pvalid
        & (is_del | is_ins)
        & (bestkey < BIG_SCORE)
        & (best_sum <= budget[:, None])
    )
    nmm1 = jnp.take_along_axis(pref_i, split[:, :, None], axis=2)[:, :, 0]
    return {
        "valid": valid,
        "is_del": is_del,
        "nindels": jnp.where(valid, n[:, :, 0], 0),
        "split": jnp.where(valid, split, 0),
        "nmm1": nmm1,
        "nmm2": jnp.where(valid, best_sum - nmm1, 0),
        "left": di,
        "right": dj,
    }


# ---------------------------------------------------------------- splice solve

def _suff_local(support, nmm, prob):
    """sufficient_splice_prob_local (stage1hr.c:6093)."""
    s = support - 3 * nmm
    thr = jnp.where(s < 14, 0.95, jnp.where(s < 20, 0.90, jnp.where(s < 26, 0.85, 0.70)))
    return prob > thr


def _fetch_span(genome, d, lmax: int):
    """Codes at genome positions d + (-20 .. lmax + 20) -> [B, P, L+41]."""
    offs = jnp.arange(-20, lmax + 21, dtype=jnp.int32)[None, None, :]
    pos = d[:, :, None].astype(jnp.int32) + offs  # d < 2^31 assumed
    return genome_ops.fetch_codes(genome.ref16, pos.astype(jnp.uint32))


def _member(sorted_arr, vals):
    """Membership of vals (uint32[...]) in a sorted uint32 array."""
    if sorted_arr is None or sorted_arr.shape[0] == 0:
        return jnp.zeros(vals.shape, bool)
    ix = jnp.clip(jnp.searchsorted(sorted_arr, vals), 0, sorted_arr.shape[0] - 1)
    return sorted_arr[ix] == vals


def _solve_splices(genome, top_d, pref, ii, jj, pvalid, lengths, budget,
                   lmax: int, novel: bool = True, known=None):
    """Vectorized solve_singlesplice over selected pairs.

    novel: scan GT-AG / CT-AC dinucleotides with maxent probabilities
    (novelsplicingp).  known: optional (donors, acceptors, antidonors,
    antiacceptors) sorted uint32 coordinate arrays — known sites are
    candidates regardless of dinucleotide and score prob 1.0
    (solve_singlesplice knowni handling, stage1hr.c:6330-6339).

    Returns dict of [B, P] arrays: valid, split, sense (True = GT-AG on
    plus genome), prob_d, prob_a, nmm1, nmm2, left, right.
    """
    di = _gather_pair(top_d, ii)
    dj = _gather_pair(top_d, jj)
    pref_i = _gather_pair(pref, ii)
    pref_j = _gather_pair(pref, jj)
    L = lengths[:, None]
    tot_j = jnp.take_along_axis(
        pref_j, L[:, :, None].astype(jnp.int32), axis=2
    )[:, :, 0][:, :, None]

    span_i = _fetch_span(genome, di, lmax)  # [B, P, lmax+41], origin 20
    span_j = _fetch_span(genome, dj, lmax)
    npos = lmax + 1
    s = jnp.arange(npos, dtype=jnp.int32)[None, None, :]

    def at(span, rel):  # code at splice-scan position s + rel
        return jax.lax.slice_in_dim(span, 20 + rel, 20 + rel + npos, axis=2)

    # sense: donor GT on segmenti at [s, s+1]; acceptor AG on segmentj at
    # [s-2, s-1].  antisense: antiacceptor CT on segmenti at [s, s+1];
    # antidonor AC on segmentj at [s-2, s-1].  (genome_hr site scans)
    if novel:
        donor_i = (at(span_i, 0) == 2) & (at(span_i, 1) == 3)
        acc_j = (at(span_j, -2) == 0) & (at(span_j, -1) == 2)
        antiacc_i = (at(span_i, 0) == 1) & (at(span_i, 1) == 3)
        antidon_j = (at(span_j, -2) == 0) & (at(span_j, -1) == 1)
    else:
        z = jnp.zeros(span_i.shape[:2] + (npos,), bool)
        donor_i = acc_j = antiacc_i = antidon_j = z
    if known is not None:
        pos_i = (di[:, :, None] + s.astype(jnp.uint32)).astype(jnp.uint32)
        pos_j = (dj[:, :, None] + s.astype(jnp.uint32)).astype(jnp.uint32)
        kd_i = _member(known[0], pos_i)
        ka_j = _member(known[1], pos_j)
        kad_j = _member(known[2], pos_j)
        kaa_i = _member(known[3], pos_i)
    else:
        z = jnp.zeros(span_i.shape[:2] + (npos,), bool)
        kd_i = ka_j = kad_j = kaa_i = z
    donor_i = donor_i | kd_i
    acc_j = acc_j | ka_j
    antiacc_i = antiacc_i | kaa_i
    antidon_j = antidon_j | kad_j

    # splice_pos range [2, L-2] (stage1hr.c:6262), genome margins
    inb = (
        (s >= 2)
        & (s <= L[:, :, None] - 2)
        & (di[:, :, None] >= 64)
        & (dj[:, :, None] >= 64)
    )

    nmm_i = pref_i[:, :, :npos].astype(jnp.int32)
    nmm_j = (tot_j - pref_j[:, :, :npos]).astype(jnp.int32)
    under = (nmm_i + nmm_j) <= budget[:, None, None]

    p_donor = maxent.splice_prob_span(span_i, "donor", npos)
    p_acc = maxent.splice_prob_span(span_j, "acceptor", npos)
    p_aacc = maxent.splice_prob_span(span_i, "antiacceptor", npos)
    p_adon = maxent.splice_prob_span(span_j, "antidonor", npos)
    # known sites score probability 1.0 (stage1hr.c:6330-6339)
    p_donor = jnp.where(kd_i, 1.0, p_donor)
    p_acc = jnp.where(ka_j, 1.0, p_acc)
    p_aacc = jnp.where(kaa_i, 1.0, p_aacc)
    p_adon = jnp.where(kad_j, 1.0, p_adon)

    sup_i = s
    sup_j = L[:, :, None] - s
    ok_sense = (
        donor_i & acc_j & inb & under
        & _suff_local(sup_i, nmm_i, p_donor)
        & _suff_local(sup_j, nmm_j, p_acc)
    )
    ok_anti = (
        antiacc_i & antidon_j & inb & under
        & _suff_local(sup_i, nmm_i, p_aacc)
        & _suff_local(sup_j, nmm_j, p_adon)
    )

    prob_sense = jnp.where(ok_sense, p_donor + p_acc, -1.0)
    prob_anti = jnp.where(ok_anti, p_aacc + p_adon, -1.0)
    # first maximum = smallest splice_pos (reference replaces only on
    # strictly greater prob); antisense must strictly beat sense
    bs = jnp.argmax(prob_sense, axis=2)
    ba = jnp.argmax(prob_anti, axis=2)
    pbs = jnp.max(prob_sense, axis=2)
    pba = jnp.max(prob_anti, axis=2)
    use_anti = pba > pbs
    split = jnp.where(use_anti, ba, bs).astype(jnp.int32)
    prob = jnp.where(use_anti, pba, pbs)
    valid = pvalid & (prob > 0.0)

    pick = lambda x: jnp.take_along_axis(x, split[:, :, None], axis=2)[:, :, 0]
    nmm1 = pick(nmm_i)
    nmm2 = pick(nmm_j)
    # donor/acceptor probabilities for output (sense: donor on i; anti:
    # donor on j)
    prob_d = jnp.where(use_anti, pick(p_adon), pick(p_donor))
    prob_a = jnp.where(use_anti, pick(p_aacc), pick(p_acc))
    return {
        "valid": valid,
        "split": jnp.where(valid, split, 0),
        "sense": ~use_anti,
        "prob_d": jnp.where(valid, prob_d, 0.0),
        "prob_a": jnp.where(valid, prob_a, 0.0),
        "nmm1": jnp.where(valid, nmm1, 0),
        "nmm2": jnp.where(valid, nmm2, 0),
        "left": di,
        "right": dj,
    }


# -------------------------------------------------------------- full pipeline

def _strand_hits(genome, index, queries, codes, nflags, lengths, conv, alt,
                 budget, params: GappedParams, known=None):
    """Run seed -> vote -> verify -> indel/splice for one strand.

    Returns a dict of [B, K] hit-candidate arrays for this strand."""
    base = params.base
    oligos, valid = _extract_oligos(
        _convert_codes(codes, conv), nflags, lengths, index.k
    )
    diag = _seed_diagonals(index, oligos, valid, base)
    top_d, votes = _top_diagonals(diag, base.ncand)

    # substitution-only hits (full-span verify)
    nmm_sub = gsnap_se._verify(genome, queries, top_d, lengths, conv, alt)
    nmm_sub = jnp.where(nmm_sub <= budget[:, None], nmm_sub, BIG_NMM)

    mm, pref = _prefix_mm(genome, queries, top_d, lengths, conv, alt)

    ii, jj, pv = _select_pairs(
        top_d,
        votes,
        lambda di, dj: (
            ((dj - di).astype(jnp.int32) >= 1)
            & ((dj - di).astype(jnp.int32) <= MAX_MIDDLE_DELETIONS)
        )
        | (
            ((di - dj).astype(jnp.int32) >= 1)
            & ((di - dj).astype(jnp.int32) <= MAX_MIDDLE_INSERTIONS)
        ),
        params.indel_pairs,
    )
    indels = _solve_indels(top_d, mm, pref, ii, jj, pv, lengths, budget, queries.lmax)

    if params.novelsplicing or known is not None:
        si, sj, sv = _select_pairs(
            top_d,
            votes,
            lambda di, dj: ((dj - di) >= jnp.uint32(1))
            & ((dj - di) <= jnp.uint32(SHORTSPLICEDIST)),
            params.splice_pairs,
        )
        splices = _solve_splices(
            genome, top_d, pref, si, sj, sv, lengths, budget, queries.lmax,
            novel=params.novelsplicing, known=known,
        )
    else:
        z = jnp.zeros(ii.shape[:1] + (params.splice_pairs,), jnp.int32)
        splices = {
            "valid": z.astype(bool), "split": z, "sense": z.astype(bool),
            "prob_d": z.astype(jnp.float32), "prob_a": z.astype(jnp.float32),
            "nmm1": z, "nmm2": z,
            "left": z.astype(jnp.uint32), "right": z.astype(jnp.uint32),
        }

    # assemble candidate hit arrays [B, K]
    def cat(*xs):
        return jnp.concatenate(xs, axis=1)

    b, nc = top_d.shape
    zsub = jnp.zeros((b, nc), jnp.int32)
    kind = cat(
        jnp.full((b, nc), KIND_SUB, jnp.int32),
        jnp.where(indels["is_del"], KIND_DEL, KIND_INS),
        jnp.full_like(splices["split"], KIND_SPLICE),
    )
    ind_nmm = indels["nmm1"] + indels["nmm2"]
    spl_nmm = splices["nmm1"] + splices["nmm2"]
    score = cat(
        nmm_sub,
        jnp.where(indels["valid"], ind_nmm + INDEL_PENALTY_MIDDLE, BIG_NMM),
        jnp.where(splices["valid"], spl_nmm + LOCALSPLICING_PENALTY, BIG_NMM),
    )
    nmm = cat(jnp.where(nmm_sub < BIG_NMM, nmm_sub, 0), ind_nmm, spl_nmm)
    left = cat(top_d, indels["left"], splices["left"])
    right = cat(top_d, indels["right"], splices["right"])
    split = cat(zsub, indels["split"], splices["split"])
    nindels = cat(zsub, indels["nindels"], jnp.zeros_like(splices["split"]))
    sense = cat(
        jnp.zeros((b, nc), bool),
        jnp.zeros_like(indels["valid"]),
        splices["sense"],
    )
    prob_d = cat(
        jnp.zeros((b, nc), jnp.float32),
        jnp.zeros(indels["split"].shape, jnp.float32),
        splices["prob_d"],
    )
    prob_a = cat(
        jnp.zeros((b, nc), jnp.float32),
        jnp.zeros(indels["split"].shape, jnp.float32),
        splices["prob_a"],
    )
    return {
        "kind": kind, "score": score, "nmm": nmm, "left": left, "right": right,
        "split": split, "nindels": nindels, "sense": sense,
        "prob_d": prob_d, "prob_a": prob_a,
    }


def gather_candidates(
    genome, index, index_minus, codes, nflags, lengths, params: GappedParams,
    alt=None, known=None,
):
    """Both-strand candidate gathering: seed/vote/verify + indel/splice
    solvers.  Returns an unranked dict of [B, NCAND] hit fields."""
    base = params.base
    b, lmax = codes.shape
    lengths = lengths.astype(jnp.int32)
    conv_plus, conv_minus = _MODE_CONV[base.mode]
    if index_minus is None:
        index_minus = index

    queries_fwd = _pack_device(codes, nflags, lengths, lmax)
    codes_rc, nflags_rc = _revcomp_batch(codes, nflags, lengths)
    queries_rev = _pack_device(codes_rc, nflags_rc, lengths, lmax)

    if base.max_mismatches >= 0:
        budget = jnp.full((b,), base.max_mismatches, jnp.int32)
    else:
        spansize = -(-index.k // index.interval) * index.interval
        budget = jnp.maximum((lengths + index.interval - 1) // spansize - 2, 0)

    hf = _strand_hits(
        genome, index, queries_fwd, codes, nflags, lengths, conv_plus, alt,
        budget, params, known,
    )
    hr = _strand_hits(
        genome, index_minus, queries_rev, codes_rc, nflags_rc, lengths,
        conv_minus, alt, budget, params, known,
    )

    out = {}
    for k in hf:
        out[k] = jnp.concatenate([hf[k], hr[k]], axis=1)
    nplus = hf["kind"].shape[1]
    ncand = out["kind"].shape[1]
    plusp = jnp.concatenate(
        [jnp.ones((b, nplus), bool), jnp.zeros((b, ncand - nplus), bool)], axis=1
    )
    out["plusp"] = plusp
    return out


def rank_hits(out, base: GsnapParams, apply_optimal: bool = True,
              maxout: int | None = None):
    """Dedup + (optional) optimal-score filter + deterministic ranking.

    Returns dict of [B, maxout] arrays plus npaths."""
    ncand = out["kind"].shape[1]
    maxout = base.maxpaths if maxout is None else maxout
    score = out["score"]
    # dedup identical (kind, left, right, split, strand) candidates:
    # multi-pass stable sort groups equal tuples adjacently, then
    # invalidate repeats and scatter scores back
    fields = ["kind", "split", "right", "plusp", "left"]
    ordl = jnp.broadcast_to(
        jnp.arange(ncand, dtype=jnp.int32)[None, :], score.shape
    )
    for k in fields:  # least-significant key first
        f = jnp.take_along_axis(out[k].astype(jnp.int32), ordl, axis=1) \
            if out[k].dtype == bool else jnp.take_along_axis(out[k], ordl, axis=1)
        o = jnp.argsort(f, axis=1, stable=True)
        ordl = jnp.take_along_axis(ordl, o, axis=1)
    sorted_fields = {k: jnp.take_along_axis(out[k], ordl, axis=1) for k in fields}
    score_s = jnp.take_along_axis(score, ordl, axis=1)
    same = jnp.ones_like(score_s, bool)
    for k in fields:
        f = sorted_fields[k].astype(jnp.int32) if sorted_fields[k].dtype == bool else sorted_fields[k]
        same = same & jnp.concatenate(
            [jnp.zeros_like(f[:, :1], bool), f[:, 1:] == f[:, :-1]], axis=1
        )
    score_s = jnp.where(same & (score_s < BIG_NMM), BIG_NMM, score_s)
    # scatter the deduped scores back
    inv = jnp.argsort(ordl, axis=1, stable=True)
    score = jnp.take_along_axis(score_s, inv, axis=1)

    # optimal-score filter (Stage3end_optimal_score, stage3hr.c:3798)
    if apply_optimal:
        best = jnp.min(score, axis=1, keepdims=True)
        score = jnp.where(score > best + base.subopt_levels, BIG_NMM, score)

    # rank: (score asc, left asc, plus first) via stable passes
    plusp = out["plusp"]
    ordp = jnp.argsort(jnp.where(plusp, 0, 1).astype(jnp.int32), axis=1, stable=True)
    tmp = {k: jnp.take_along_axis(out[k], ordp, axis=1) for k in out}
    score = jnp.take_along_axis(score, ordp, axis=1)
    ordl2 = jnp.argsort(tmp["left"], axis=1, stable=True)
    tmp = {k: jnp.take_along_axis(tmp[k], ordl2, axis=1) for k in tmp}
    score = jnp.take_along_axis(score, ordl2, axis=1)
    ords = jnp.argsort(score, axis=1, stable=True)[:, :maxout]
    final = {k: jnp.take_along_axis(tmp[k], ords, axis=1) for k in tmp}
    final_score = jnp.take_along_axis(score, ords, axis=1)

    ok = final_score < BIG_NMM
    final["score"] = jnp.where(ok, final_score, BIG_NMM)
    final["npaths"] = jnp.sum(ok, axis=1).astype(jnp.int32)
    for k in ("left", "right"):
        final[k] = jnp.where(ok, final[k], 0).astype(jnp.uint32)
    for k in ("kind", "split", "nindels", "nmm"):
        final[k] = jnp.where(ok, final[k], 0)
    return final


@partial(jax.jit, static_argnames=("params",))
def align_batch_gapped(
    genome: genome_ops.GenomeArrays,
    index: IndexArrays,
    codes,
    nflags,
    lengths,
    params: GappedParams = GappedParams(),
    index_minus: IndexArrays | None = None,
    alt=None,
    known=None,
):
    """Full single-end pipeline: substitutions + middle indels + local
    splicing (novel when params.novelsplicing; known sites when
    ``known`` arrays are given).

    Returns dict of [B, maxpaths] arrays: kind, score, nmm, left, right,
    split, nindels, sense, prob_d, prob_a, plusp; plus npaths int32[B].
    """
    out = gather_candidates(
        genome, index, index_minus, codes, nflags, lengths, params, alt, known
    )
    return rank_hits(out, params.base)
