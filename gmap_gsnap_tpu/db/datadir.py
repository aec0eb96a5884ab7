"""Database directory loader (the runtime counterpart of build.py).

Loads a GMAP/GSNAP database directory — ours or one built by the
reference tools (identical formats) — into host arrays plus device
arrays for the alignment pipelines.  Replaces datadir.c + the load
sequence of gsnap.c:1899-2055 (chromosome IIT, genome blocks, indexdb).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import cached_property

import numpy as np

from . import genomecomp, indexdb
from .iit import IIT


@dataclass
class GenomeDB:
    dbdir: str
    dbname: str
    codes: np.ndarray          # uint8[G]
    flags: np.ndarray          # bool[G]
    chr_names: list[str]
    chr_starts: np.ndarray     # int64[nchrs] universal starts
    chr_ends: np.ndarray       # int64[nchrs] universal exclusive ends
    index_files: dict | None = None
    k: int = 0
    interval: int = 0
    basesize: int = 0

    @cached_property
    def genome_str(self) -> "LazyGenomeStr":
        return LazyGenomeStr(self.codes, self.flags)

    @cached_property
    def offsets(self) -> np.ndarray | None:
        """uint32[4^k+1]; loaded lazily (gamma expansion can be slow)."""
        if self.index_files is None:
            return None
        return indexdb.read_offsets(self.index_files)

    @cached_property
    def positions(self) -> np.ndarray | None:
        if self.index_files is None:
            return None
        return indexdb.read_positions(self.index_files["positions"])

    @classmethod
    def open(cls, dbdir: str, dbname: str | None = None, idx_prefix: str = "ref",
             required_k: int = 0, required_interval: int = 0,
             required_basesize: int = 0) -> "GenomeDB":
        if dbname is None:
            dbname = os.path.basename(dbdir.rstrip("/"))
        # allow -D dir -d db layout where files live in dir/db/db.*
        base = os.path.join(dbdir, f"{dbname}.genomecomp")
        if not os.path.exists(base):
            sub = os.path.join(dbdir, dbname)
            if os.path.exists(os.path.join(sub, f"{dbname}.genomecomp")):
                dbdir = sub
                base = os.path.join(dbdir, f"{dbname}.genomecomp")
            else:
                raise FileNotFoundError(f"no {dbname}.genomecomp under {dbdir}")

        chr_iit = IIT.read(os.path.join(dbdir, f"{dbname}.chromosome.iit"))
        names = chr_iit.labels[""]
        ivs = chr_iit.intervals[""]
        starts = np.array([iv.low for iv in ivs], dtype=np.int64)
        ends = np.array([iv.high + 1 for iv in ivs], dtype=np.int64)
        genome_len = int(ends.max()) if len(ends) else 0

        codes, flags = genomecomp.read(base, genome_len)

        files = indexdb.index_filenames(
            dbdir, dbname, idx_prefix, required_k=required_k,
            required_interval=required_interval,
            required_basesize=required_basesize)
        k = interval = basesize = 0
        if files is not None:
            k, interval, basesize = files["k"], files["interval"], files["basesize"]

        return cls(
            dbdir=dbdir,
            dbname=dbname,
            codes=codes,
            flags=flags,
            chr_names=names,
            chr_starts=starts,
            chr_ends=ends,
            index_files=files,
            k=k,
            interval=interval,
            basesize=basesize,
        )

    def chrnum_at(self, pos: np.ndarray) -> np.ndarray:
        """Chromosome index for universal coordinates."""
        return np.searchsorted(self.chr_ends, pos, side="right")

    @cached_property
    def device_genome(self):
        from ..ops import genome as genome_ops

        return genome_ops.GenomeArrays.from_codes(self.codes, self.flags, self.chr_ends)

    @cached_property
    def device_index(self):
        from ..align import gsnap_se

        if self.offsets is None:
            raise ValueError("database has no k-mer index")
        return gsnap_se.IndexArrays.from_host(self.offsets, self.positions, self.k, self.interval)


class LazyGenomeStr:
    """String-like windowed view over the genome code arrays.

    Post-processing consumes small genomic windows; materializing the
    whole genome as a Python str costs ~1 byte/nt ON TOP of the code
    arrays and collapses at 3 Gbp.  This view keeps one lazily-built
    ASCII uint8 array (vectorized host compares index it directly via
    .ascii) and decodes only the requested slices to str.

    Host memory budget per nt: codes (1 B) + flags (1 B, bool) +
    ascii (1 B) = 3 B/nt -> ~9 GB for a 3 Gbp genome, vs ~12 GB with
    the former whole-genome str (plus its allocation spike).
    """

    _LUT = np.frombuffer(b"ACGT", np.uint8)

    def __init__(self, codes: np.ndarray, flags: np.ndarray):
        self._codes = codes
        self._flags = flags
        self._ascii: np.ndarray | None = None

    @property
    def ascii(self) -> np.ndarray:
        if self._ascii is None:
            a = self._LUT[self._codes]
            if self._flags is not None and self._flags.any():
                a = a.copy()
                a[self._flags] = ord("N")
            self._ascii = a
        return self._ascii

    def __len__(self) -> int:
        return len(self._codes)

    def __getitem__(self, i) -> str:
        if isinstance(i, slice):
            return self.ascii[i].tobytes().decode("latin-1")
        return chr(self.ascii[int(i)])
