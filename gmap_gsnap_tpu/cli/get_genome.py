"""get-genome: extract a genomic segment from a database.

Usage: python -m gmap_gsnap_tpu.cli.get_genome -D <dir> -d <db> <chr>:<start>..<end>
Coordinates are 1-based inclusive; start > end yields the reverse
complement (reference get-genome.c behavior, README:478-489).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="get-genome")
    p.add_argument("-D", "--dir", required=True)
    p.add_argument("-d", "--db", required=True)
    p.add_argument("query")
    args = p.parse_args(argv)

    from ..db.datadir import GenomeDB
    from ..db.iit_text import parse_coords
    from ..utils import dna

    db = GenomeDB.open(
        args.dir if args.dir.endswith(args.db) else f"{args.dir}/{args.db}", args.db
    )
    div, start, end = parse_coords(args.query)
    revcomp = start > end
    if revcomp:
        start, end = end, start
    if div:
        try:
            ci = db.chr_names.index(div)
        except ValueError:
            print(f"unknown chromosome {div}", file=sys.stderr)
            return 9
        off = int(db.chr_starts[ci])
    else:
        ci, off = 0, 0
    lo, hi = off + start - 1, off + end
    seg = dna.decode(db.codes[lo:hi], db.flags[lo:hi])
    label = f"{div or db.chr_names[0]}:{end}..{start}" if revcomp else f"{div or db.chr_names[0]}:{start}..{end}"
    if revcomp:
        seg = dna.revcomp_str(seg)
    # header repeats the query (reference get-genome.c header convention)
    sys.stdout.write(f">{label} {args.query}\n")
    for i in range(0, len(seg), 60):
        sys.stdout.write(seg[i : i + 60] + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
