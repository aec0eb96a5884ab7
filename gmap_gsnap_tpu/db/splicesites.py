"""Known splice sites: load a splicesites map IIT into sorted arrays.

Replaces the reference's splicetrie machinery for SITE LOOKUP
(Splicetrie_retrieve_via_splicesites, splicetrie_build.c:338): the
splicing IIT stores typed intervals ">label chr:X..Y donor|acceptor
[dist]" (README:848-888; 1-based, X from the donor exon, Y from the
acceptor exon; X<Y = plus strand, X>Y = minus).  The universal scan
coordinate used by solve_singlesplice equals Interval_low + chroffset
for every site class (the 1-based-exon / 0-based-intron shifts cancel),
so each class reduces to one sorted uint32 array and membership testing
is a searchsorted gather — no trie needed for interior splices.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .iit import IIT


@dataclass
class SpliceSites:
    donors: np.ndarray         # sorted uint32 universal coords
    acceptors: np.ndarray
    antidonors: np.ndarray
    antiacceptors: np.ndarray
    max_dist: int              # largest annotated intron distance (0 if none)
    labels: dict | None = None  # universal coord -> site label

    @property
    def nsites(self) -> int:
        return (len(self.donors) + len(self.acceptors)
                + len(self.antidonors) + len(self.antiacceptors))

    def device_arrays(self):
        import jax.numpy as jnp

        return tuple(
            jnp.asarray(a)
            for a in (self.donors, self.acceptors, self.antidonors,
                      self.antiacceptors)
        )

    def device_bitmasks(self, genome_length: int):
        """Four genome-length bitvectors (uint32 words) — the TPU form
        consumed by the splice scan (cf. the reference's splicecomp
        bit-vector, splicetrie_build.c:464)."""
        import jax.numpy as jnp

        nwords = (genome_length + 31) // 32 + 2
        out = []
        for a in (self.donors, self.acceptors, self.antidonors,
                  self.antiacceptors):
            bits = np.zeros(nwords, np.uint32)
            if len(a):
                w = a >> 5
                np.bitwise_or.at(bits, w, np.uint32(1) << (a & 31))
            out.append(jnp.asarray(bits))
        return tuple(out)


def load_splicesites(iit: IIT, chr_names: list[str],
                     chr_starts: np.ndarray) -> SpliceSites:
    """Collect per-class sorted site coordinate arrays from a splicing
    IIT, keyed by division name -> chromosome offset."""
    offs = {name: int(chr_starts[i]) for i, name in enumerate(chr_names)}
    buckets: dict[str, list[int]] = {
        "donors": [], "acceptors": [], "antidonors": [], "antiacceptors": []
    }
    labels: dict[int, str] = {}
    max_dist = 0
    for div, ivs in iit.intervals.items():
        if div not in offs:
            continue
        chroffset = offs[div]
        anns = iit.annotations.get(div, [])
        for i, iv in enumerate(ivs):
            typ = iit.types[iv.type]
            pos = iv.low + chroffset
            if typ == "donor":
                key = "donors" if iv.sign >= 0 else "antidonors"
            elif typ == "acceptor":
                key = "acceptors" if iv.sign >= 0 else "antiacceptors"
            else:
                continue
            buckets[key].append(pos)
            labs = iit.labels.get(div, [])
            if i < len(labs):
                labels.setdefault(pos, labs[i])
            ann = anns[i].decode() if i < len(anns) and anns[i] else ""
            if ann.strip():
                try:
                    max_dist = max(max_dist, int(ann.split()[0]))
                except ValueError:
                    pass
    return SpliceSites(
        donors=np.array(sorted(set(buckets["donors"])), np.uint32),
        acceptors=np.array(sorted(set(buckets["acceptors"])), np.uint32),
        antidonors=np.array(sorted(set(buckets["antidonors"])), np.uint32),
        antiacceptors=np.array(sorted(set(buckets["antiacceptors"])), np.uint32),
        max_dist=max_dist,
        labels=labels,
    )
