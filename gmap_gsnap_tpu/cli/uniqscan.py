"""uniqscan: minimal unique alignment length scanner (src/uniqscan.c).

Prints "sublength: npaths" per prefix length, starting at index1part+2
and stopping once a unique alignment is found (uniqueness_scan,
uniqscan.c:378-452).  TPU re-design: instead of re-running the engine
per prefix, ALL prefix lengths align in one batched device call (rows =
prefixes), and the scan walks the npaths vector.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    import numpy as np

    p = argparse.ArgumentParser(prog="uniqscan")
    p.add_argument("-D", "--dir", required=True)
    p.add_argument("-d", "--db", required=True)
    p.add_argument("-3", "--from-right", action="store_true", dest="from_right",
                   help="scan suffixes instead of prefixes")
    p.add_argument("sequence")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..align import gsnap_gapped
    from ..db.datadir import GenomeDB
    from ..utils import dna, jaxenv

    jaxenv.enable_compilation_cache()
    db = GenomeDB.open(
        args.dir if args.dir.endswith(args.db) else f"{args.dir}/{args.db}",
        args.db,
    )
    seq = args.sequence.upper()
    full = len(seq)
    minlen = db.k + 2
    if full < minlen:
        return 0

    lengths = np.arange(minlen, full + 1, dtype=np.int32)
    b = len(lengths)
    codes = np.zeros((b, full), np.uint8)
    nflags = np.zeros((b, full), bool)
    for i, sublen in enumerate(lengths):
        sub = seq[full - sublen :] if args.from_right else seq[:sublen]
        c, f = dna.encode(sub)
        codes[i, : sublen] = c
        nflags[i, : sublen] = f

    res = gsnap_gapped.align_batch_gapped(
        db.device_genome, db.device_index,
        jnp.asarray(codes), jnp.asarray(nflags), jnp.asarray(lengths),
        gsnap_gapped.GappedParams(),
    )
    npaths = np.asarray(res["npaths"])
    for i, sublen in enumerate(lengths):
        print(f"{sublen}: {npaths[i]}")
        if npaths[i] <= 1:
            break
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
