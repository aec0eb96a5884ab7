"""Dense NumPy oracle for the dynprog kernels.

A direct, readable transcription of the reference recurrences
(src/dynprog.c:1424 compute_scores_lookup_fwd, :2612 traceback, :3291
bridge_intron_gap novel branch, :2236/:2294 find_best_endpoint*) used
to verify the band-packed device kernels on randomized problems.
Sequences are int codes 0..3 = ACGT, 4 = N, 5 = '*'.
"""

import numpy as np

NEG_INF = -1000000
STOP, DIAG, HORIZ, VERT = 0, 1, 2, 3


def pairscore(mat, a, b):
    return int(mat[a][b])


def compute_matrices(q, g, open_, extend, pairmat, extraband,
                     jump_late, widebandp=True):
    """Returns (nogap, gap1, gap2, dir_nogap, dir_gap1, dir_gap2) dense
    [(M+1), (N+1)] arrays; q rows, g cols."""
    M, N = len(q), len(g)
    if not widebandp:
        lband = rband = extraband
    elif N >= M:
        rband = N - M + extraband
        lband = extraband
    else:
        lband = M - N + extraband
        rband = extraband

    nogap = np.full((M + 1, N + 1), NEG_INF, np.int64)
    gap1 = np.full((M + 1, N + 1), NEG_INF, np.int64)
    gap2 = np.full((M + 1, N + 1), NEG_INF, np.int64)
    dng = np.zeros((M + 1, N + 1), np.int8)
    dg1 = np.zeros((M + 1, N + 1), np.int8)
    dg2 = np.zeros((M + 1, N + 1), np.int8)

    nogap[0][0] = 0
    pen = open_
    for c in range(1, min(rband, N) + 1):
        pen += extend
        gap1[0][c] = pen
        dg1[0][c] = HORIZ
    if N >= 1 and rband >= 1:
        dg1[0][1] = STOP
    pen = open_
    for r in range(1, min(lband, M) + 1):
        pen += extend
        gap2[r][0] = pen
        dg2[r][0] = VERT
    if M >= 1 and lband >= 1:
        dg2[1][0] = STOP

    for c in range(1, N + 1):
        rlo = max(c - rband, 1)
        rhigh = min(c + lband, M)
        for r in range(rlo, rhigh + 1):
            # GAP1
            best = nogap[r][c - 1] + open_
            bd = DIAG
            s = gap1[r][c - 1]
            if s > best or (s == best and jump_late):
                best, bd = s, HORIZ
            gap1[r][c] = best + extend
            dg1[r][c] = bd
            # GAP2
            best = nogap[r - 1][c] + open_
            bd = DIAG
            s = gap2[r - 1][c]
            if s > best or (s == best and jump_late):
                best, bd = s, VERT
            gap2[r][c] = best + extend
            dg2[r][c] = bd
            # NOGAP
            best = nogap[r - 1][c - 1]
            bd = DIAG
            s = gap1[r - 1][c - 1]
            if s > best or (s == best and jump_late):
                best, bd = s, HORIZ
            s = gap2[r - 1][c - 1]
            if s > best or (s == best and jump_late):
                best, bd = s, VERT
            nogap[r][c] = best + pairscore(pairmat, q[r - 1], g[c - 1])
            dng[r][c] = bd
    return nogap, gap1, gap2, dng, dg1, dg2


def traceback(dng, dg1, dg2, r, c):
    """Reference traceback (dynprog.c:2612): list of ops from (r, c)
    back to a STOP, each ('diag', qpos, gpos) / ('horiz', gpos) /
    ('vert', qpos), in traceback (end->start) order."""
    ops = []
    while dng[r][c] != STOP and not (r == 0 and c == 0):
        if r == 0 or c == 0:
            break  # degenerate; device kernel stops here too
        ops.append(("diag", r - 1, c - 1))
        d = dng[r][c]
        if d == DIAG:
            r, c = r - 1, c - 1
        elif d == HORIZ:
            r, c = r - 1, c - 1
            ops.append(("horiz", c - 1))
            while dg1[r][c] == HORIZ:
                c -= 1
                ops.append(("horiz", c - 1))
            c -= 1
        else:
            r, c = r - 1, c - 1
            ops.append(("vert", r - 1))
            while dg2[r][c] == VERT:
                r -= 1
                ops.append(("vert", r - 1))
            r -= 1
    return ops


def find_best_endpoint(nogap, M, N, extraband, jump_late):
    best = 0
    br = bc = 0
    for r in range(1, M + 1):
        clo = max(r - extraband, 1)
        chigh = min(r + extraband, N)
        for c in range(clo, chigh + 1):
            if nogap[r][c] > best or (jump_late and nogap[r][c] >= best):
                best, br, bc = nogap[r][c], r, c
    return best, br, bc


def find_best_endpoint_queryend(nogap, M, N, extraband, jump_late):
    if N >= M:
        rband, lband = N - M + extraband, extraband
    else:
        lband, rband = M - N + extraband, extraband
    best = NEG_INF
    br, bc = M, 0
    r = M
    clo = max(r - lband, 1)
    chigh = min(r + rband, N)
    for c in range(clo, chigh + 1):
        if nogap[r][c] > best or (jump_late and nogap[r][c] >= best):
            best, br, bc = nogap[r][c], r, c
    return best, br, bc


LEFT_GT, LEFT_GC, LEFT_AT, LEFT_CT = 0x21, 0x10, 0x08, 0x06
RIGHT_AG, RIGHT_AC, RIGHT_GC, RIGHT_AT = 0x30, 0x0C, 0x02, 0x01
GTAG_FWD, GCAG_FWD, ATAC_FWD = 0x20, 0x10, 0x08
GTAG_REV, GCAG_REV, ATAC_REV = 0x04, 0x02, 0x01


def intron_score(ityp, cdna_direction, canonical_reward, finalp,
                 gcag=15, fgcag=20, atac=12, fatac=12):
    gc = fgcag if finalp else gcag
    at = fatac if finalp else atac
    if cdna_direction > 0:
        tab = {GTAG_FWD: canonical_reward, GCAG_FWD: gc, ATAC_FWD: at}
    elif cdna_direction < 0:
        tab = {GTAG_REV: canonical_reward, GCAG_REV: gc, ATAC_REV: at}
    else:
        tab = {GTAG_FWD: canonical_reward, GCAG_FWD: gc, ATAC_FWD: at,
               GTAG_REV: canonical_reward, GCAG_REV: gc, ATAC_REV: at}
    return tab.get(ityp, 0), (ityp if ityp in tab else 0)


def bridge_intron_gap(nogapL, dngL, nogapR, dngR, gL, gR_rev,
                      M, NL, NR, extraband_paired, canonical_reward,
                      cdna_direction, finalp, leftoffset, rightoffset,
                      left_known=None, right_known=None, halfp=False):
    """Novel-splicing branch (dynprog.c:3701-3830).  gR_rev is the
    right genome region REVERSED (matching the rev matrix)."""
    left_known = left_known if left_known is not None else np.zeros(NL + 1, int)
    right_known = right_known if right_known is not None else np.zeros(NR + 1, int)

    leftdi = np.zeros(NL + 1, int)
    for cL in range(NL - 1):
        a, b = gL[cL], gL[cL + 1]
        if (a, b) == (2, 3):
            leftdi[cL] = LEFT_GT
        elif (a, b) == (2, 1):
            leftdi[cL] = LEFT_GC
        elif (a, b) == (0, 3):
            leftdi[cL] = LEFT_AT
        elif (a, b) == (1, 3):
            leftdi[cL] = LEFT_CT
    rightdi = np.zeros(NR + 1, int)
    for cR in range(NR - 1):
        r1, r2 = gR_rev[cR], gR_rev[cR + 1]
        if (r2, r1) == (0, 2):
            rightdi[cR] = RIGHT_AG
        elif (r2, r1) == (0, 1):
            rightdi[cR] = RIGHT_AC
        elif (r2, r1) == (2, 1):
            rightdi[cR] = RIGHT_GC
        elif (r2, r1) == (0, 3):
            rightdi[cR] = RIGHT_AT

    if NL >= M:
        rbandL, lbandL = NL - M + extraband_paired, extraband_paired
    else:
        lbandL, rbandL = M - NL + extraband_paired, extraband_paired
    if NR >= M:
        rbandR, lbandR = NR - M + extraband_paired, extraband_paired
    else:
        lbandR, rbandR = M - NR + extraband_paired, extraband_paired

    bestscore = -100000
    bestI = -100000
    out = None
    for rL in range(1, M):
        rR = M - rL
        cloL, chighL = max(rL - lbandL, 1), min(rL + rbandL, NL - 1)
        cloR, chighR = max(rR - lbandR, 1), min(rR + rbandR, NR - 1)
        # indel on left
        for cL in range(cloL, chighL + 1):
            scoreL = nogapL[rL][cL] + left_known[cL]
            if dngL[rL][cL] in (HORIZ, VERT):
                scoreL -= 1
            cR = rR
            if cR < rightoffset - leftoffset - cL and 1 <= cR <= NR - 1:
                scoreR = nogapR[rR][cR] + right_known[cR]
                scoreI, ityp = intron_score(
                    leftdi[cL] & rightdi[cR], cdna_direction,
                    canonical_reward, finalp)
                if scoreL + scoreI + scoreR > bestscore:
                    bestscore = scoreL + scoreI + scoreR
                    bestI = scoreI
                    out = (rL, rR, cL, cR, ityp)
        # indel on right
        for cR in range(cloR, chighR + 1):
            scoreR = nogapR[rR][cR] + right_known[cR]
            if dngR[rR][cR] in (HORIZ, VERT):
                scoreR -= 1
            cL = rL
            if cL < rightoffset - leftoffset - cR and 1 <= cL <= NL - 1:
                scoreL = nogapL[rL][cL] + left_known[cL]
                scoreI, ityp = intron_score(
                    leftdi[cL] & rightdi[cR], cdna_direction,
                    canonical_reward, finalp)
                if scoreL + scoreI + scoreR > bestscore:
                    bestscore = scoreL + scoreI + scoreR
                    bestI = scoreI
                    out = (rL, rR, cL, cR, ityp)
    final = bestscore - bestI // 2 if halfp else bestscore
    return final, out
