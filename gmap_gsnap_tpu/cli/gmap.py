"""gmap-compatible CLI (subset): cDNA/EST spliced alignment.

Usage: python -m gmap_gsnap_tpu.cli.gmap -D <dir> -d <db> [-f format] <fasta>
       python -m gmap_gsnap_tpu.cli.gmap -g <genomicseg> <fasta>   (user segment)
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gmap")
    p.add_argument("-D", "--dir")
    p.add_argument("-d", "--db")
    p.add_argument("-g", "--gseg", help="user-supplied genomic segment FASTA")
    p.add_argument("-f", "--format", default="paths",
                   choices=["paths", "gff3_gene", "summary", "samse"])
    p.add_argument("-A", action="store_true", help="alignment output")
    p.add_argument("input", nargs="+")
    args = p.parse_args(argv)

    from ..align import gmap as gmap_mod
    from ..db import build as build_mod
    from ..db.datadir import GenomeDB
    from ..io import fasta, gmap_out
    from ..utils import dna

    if args.gseg:
        # user-segment mode: build an in-memory DB from the segment
        import tempfile

        tmp = tempfile.mkdtemp()
        dbdir = build_mod.build_db([args.gseg], "usersegment", tmp, k=12)
        db = GenomeDB.open(dbdir, "usersegment")
        dbmode = False
    else:
        if not (args.dir and args.db):
            p.error("need -D/-d or -g")
        db = GenomeDB.open(
            args.dir if args.dir.endswith(args.db) else f"{args.dir}/{args.db}",
            args.db,
        )
        dbmode = True

    gstr = dna.decode(db.codes, db.flags)
    if args.format == "samse":
        sys.stdout.write("".join(
            f"@SQ\tSN:{n}\tLN:{int(e - s)}\n"
            for n, s, e in zip(db.chr_names, db.chr_starts, db.chr_ends)
        ))
    for path_in in args.input:
        for rec in fasta.read_fasta(path_in):
            path = gmap_mod.align_cdna(db, rec.seq)
            qstr = (
                rec.seq.upper()
                if path is None or path.watsonp
                else dna.revcomp_str(rec.seq.upper())
            )
            if args.format == "samse":
                if path is None:
                    sys.stdout.write(gmap_out.sam_record(
                        None, rec.label, rec.seq, None, "", 0, qstr, gstr))
                else:
                    chrnum = int(__import__("numpy").searchsorted(
                        db.chr_ends, path.gstart, side="right"))
                    sys.stdout.write(gmap_out.sam_record(
                        path, rec.label, rec.seq, None,
                        db.chr_names[chrnum], int(db.chr_starts[chrnum]),
                        qstr, gstr,
                    ))
                continue
            if path is None:
                sys.stdout.write(f">{rec.header}\nPaths (0):\n\n")
                continue
            chrnum = int(
                __import__("numpy").searchsorted(db.chr_ends, path.gstart, side="right")
            )
            chrname = db.chr_names[chrnum]
            chrlength = int(db.chr_ends[chrnum] - db.chr_starts[chrnum])
            path.chrnum = chrnum
            if args.format == "gff3_gene":
                sys.stdout.write(
                    gmap_out.gff3_gene(
                        path, 1, rec.label, chrname, db.dbname, qstr, gstr
                    )
                )
                sys.stdout.write("###\n")
            else:
                sys.stdout.write(
                    gmap_out.paths_output(
                        rec.header, [path], chrname, chrlength, qstr, gstr, dbmode
                    )
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())
