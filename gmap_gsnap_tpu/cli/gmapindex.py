"""gmap_build-style database builder CLI.

One command replaces the reference's gmap_setup/gmap_build pipeline
(fa_coords | gmap_process | gmapindex -A/-G/-O/-P):

    python -m gmap_gsnap_tpu.cli.gmapindex -d <db> -D <destdir> [-k 12] <fasta...>
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gmapindex")
    p.add_argument("-d", "--db", required=True)
    p.add_argument("-D", "--destdir", default=".")
    p.add_argument("-k", "--kmer", type=int, default=12)
    p.add_argument("-b", "--basesize", type=int, default=None)
    p.add_argument("-q", "--interval", type=int, default=3)
    p.add_argument("--sort", default="none", choices=["none", "alpha", "chrom"])
    p.add_argument("fasta", nargs="+")
    args = p.parse_args(argv)

    from ..db import build
    from ..db.iit import NO_SORT, ALPHA_SORT, CHROM_SORT

    sort = {"none": NO_SORT, "alpha": ALPHA_SORT, "chrom": CHROM_SORT}[args.sort]
    dbdir = build.build_db(
        args.fasta, args.db, args.destdir,
        k=args.kmer, basesize=args.basesize, interval=args.interval, sort=sort,
    )
    print(f"built {dbdir}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
