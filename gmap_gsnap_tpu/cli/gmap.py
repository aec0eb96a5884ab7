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
                   choices=["paths", "gff3_gene", "gff3_match_cdna",
                            "gff3_match_est", "summary", "samse", "sampe",
                            "psl",
                            "splicesites", "introns", "map_genes",
                            "map_exons", "coords"])
    p.add_argument("-A", action="store_true", help="alignment output")
    p.add_argument("-3", dest="continuous", action="store_true",
                   help="show alignment in three continuous lines")
    p.add_argument("-4", dest="continuous_by_exon", action="store_true",
                   help="show alignment in three lines per exon")
    p.add_argument("-S", dest="summary_only", action="store_true",
                   help="summary output + exon table (no alignment rows)")
    p.add_argument("-n", "--npaths", type=int, default=5,
                   help="maximum number of paths to show (0: one path, "
                        "or two if chimera detected)")
    p.add_argument("-Z", "--compress", action="store_true",
                   help="compressed output format")
    p.add_argument("-E", "--exons", default=None, choices=["cdna", "genomic"],
                   help="print exon sequences")
    p.add_argument("-K", "--intronlength", type=int, default=1_000_000,
                   help="max intron length (gmap.c:233 maxintronlen_bound)")
    p.add_argument("-L", "--totallength", type=int, default=2_400_000,
                   help="max total genomic span (gmap.c:232)")
    p.add_argument("-x", "--chimera-margin", type=int, default=40,
                   help="uncovered-margin threshold for chimera search "
                        "(gmap.c:234)")
    p.add_argument("-q", "--part", default=None,
                   help="process only the i-th of n parts, as i/n")
    p.add_argument("-1", "--selfalign", action="store_true",
                   help="align the input sequence against itself")
    p.add_argument("-2", "--pairalign", action="store_true",
                   help="align the 2nd input sequence against the 1st")
    p.add_argument("-O", "--ordered", action="store_true",
                   help="accepted for compatibility (output is always "
                        "in input order)")
    p.add_argument("-t", "--nthreads", type=int, default=1,
                   help="accepted for compatibility")
    p.add_argument("-5", "--md5", action="store_true",
                   help="print MD5 checksum in query headers")
    p.add_argument("-l", "--wraplength", type=int, default=50,
                   help="alignment block width (gmap -l, pair.c)")
    p.add_argument("-i", "--introngap", type=int, default=3,
                   help="dots shown in -A intron gaps (gmap -i ngap)")
    p.add_argument("-c", "--chrsubset", default=None,
                   help="restrict the search to one chromosome")
    p.add_argument("-m", "--map", dest="mapfile", default=None,
                   help="map IIT for annotation lookup per path")
    p.add_argument("-M", "--mapdir", default=None,
                   help="directory holding the map IIT")
    p.add_argument("-b", "--mapboth", action="store_true",
                   help="report map hits on both strands")
    p.add_argument("-u", "--nflanking", type=int, default=0,
                   help="also report this many flanking map entries")
    p.add_argument("--print-comment", action="store_true",
                   help="print the map entry annotations too")
    p.add_argument("-F", "--fulllength", action="store_true",
                   help="translation starts from the first Met "
                        "(fulllengthp, gmap.c:315)")
    p.add_argument("-z", "--direction", default="auto",
                   choices=["sense_force", "antisense_force",
                            "sense_filter", "antisense_filter", "auto"],
                   help="cDNA direction to try/keep (gmap.c:3129-3148; "
                        "force modes are applied as filters here)")
    p.add_argument("--nolengths", "-N", action="store_true",
                   help="omit intron lengths in -A output (nointronlenp)")
    p.add_argument("-P", "--protein-dna", action="store_true",
                   help="print protein sequence (cDNA)")
    p.add_argument("-Q", "--protein-gen", action="store_true",
                   help="print protein sequence (genomic)")
    p.add_argument("input", nargs="+")
    args = p.parse_args(argv)

    from ..align import gmap as gmap_mod
    from ..align import translation as _tr

    _tr.FULLLENGTH_P = args.fulllength
    from ..db import build as build_mod
    from ..db.datadir import GenomeDB
    from ..io import fasta, gmap_out
    from ..utils import dna

    if args.selfalign or args.pairalign:
        # -1/-2 (gmap.c:2935-2936): first input sequence acts as the
        # genome; the query is the same sequence (-1) or the second
        # sequence (-2)
        import tempfile

        seqs = []
        for path_in in args.input:
            seqs.extend(fasta.read_fasta(path_in))
        if args.pairalign and len(seqs) < 2:
            p.error("-2/--pairalign needs two input sequences")
        gtmp = tempfile.mkdtemp()
        gfa = f"{gtmp}/useralign.fa"
        with open(gfa, "w") as f:
            f.write(f">{seqs[0].label}\n{seqs[0].seq}\n")
        dbdir = build_mod.build_db([gfa], "usersegment", gtmp, k=12)
        db = GenomeDB.open(dbdir, "usersegment")
        dbmode = False
        qrec = seqs[0] if args.selfalign else seqs[1]
        qfa = f"{gtmp}/query.fa"
        with open(qfa, "w") as f:
            f.write(f">{qrec.label} {qrec.header.split(None, 1)[1] if len(qrec.header.split(None, 1)) > 1 else ''}".rstrip()
                    + f"\n{qrec.seq}\n")
        args.input = [qfa]
    elif args.gseg:
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

    map_iit = None
    if args.mapfile:
        import os as _os

        from ..db.iit import IIT as _IIT

        mp = args.mapfile
        for cand in (mp,
                     _os.path.join(args.mapdir or "", mp),
                     _os.path.join(args.mapdir or "", f"{mp}.iit"),
                     _os.path.join(db.dbdir, f"{db.dbname}.maps", mp),
                     _os.path.join(db.dbdir, f"{db.dbname}.maps",
                                   f"{mp}.iit")):
            if cand and _os.path.exists(cand):
                map_iit = _IIT.read(cand)
                break
        if map_iit is None:
            print(f"gmap: cannot find map file {mp}", file=sys.stderr)
            return 9

    # -c/--chrsubset: the 2012 reference resolves the named subset from
    # <db>.chrsubset and prints the "[chrsubset: NAME]" label on every
    # Paths line — but its stage1 does NOT actually restrict the search
    # (verified: a query outside the subset still reports its path).
    # Mirrored label-only for byte parity; the engine's genome_range
    # hook exists for real restriction if wanted.
    genome_range = None
    chrsubset_label = None
    if args.chrsubset:
        import os as _os1

        subf = _os1.path.join(db.dbdir, f"{db.dbname}.chrsubset")
        found = False
        if _os1.path.exists(subf):
            cur = None
            for line in open(subf):
                if line.startswith(">"):
                    cur = line[1:].strip()
                    if cur == args.chrsubset:
                        found = True
                        break
        if not found:
            print(f"Unable to find subset {args.chrsubset} in chromosome "
                  f"subset file {subf}", file=sys.stderr)
            return 9
        chrsubset_label = args.chrsubset

    gstr = db.genome_str
    if args.format in ("samse", "sampe"):
        sys.stdout.write("".join(
            f"@SQ\tSN:{n}\tLN:{int(e - s)}\n"
            for n, s, e in zip(db.chr_names, db.chr_starts, db.chr_ends)
        ))
    import numpy as _np

    chimera_ok = args.format in ("paths", "summary", "samse") and dbmode
    maxpaths = 1 if args.npaths == 0 else args.npaths
    allrecs = []
    for path_in in args.input:
        allrecs.extend(fasta.read_fasta(path_in))
    if args.part:
        pi_, pn_ = (int(x) for x in args.part.split("/"))
        allrecs = allrecs[pi_::pn_]
    if args.md5:
        import hashlib

        allrecs = [
            fasta.Record(r.label,
                         f"{r.header} md5:"
                         + hashlib.md5(r.seq.encode()).hexdigest(),
                         r.seq, r.quality)
            for r in allrecs
        ]
    if True:
        for rec in allrecs:
            if len(rec.seq) < db.k and args.format == "paths":
                # gmap.c:2425-2441 failure types
                word = ("Empty sequence" if len(rec.seq) == 0
                        else "Short sequence < index oligo size")
                sub0 = (f"  [chrsubset: {chrsubset_label}]"
                        if chrsubset_label else "")
                sys.stdout.write(
                    f">{rec.header}\nPaths (0):{sub0} *** {word} ***\n\n")
                if args.A or args.summary_only or args.continuous_by_exon:
                    sys.stdout.write("Alignments:\n")
                if map_iit is not None:
                    sys.stdout.write("Maps:\n")
                continue
            chimera_pos = None
            if dbmode:
                allpaths = gmap_mod.align_cdna_paths(
                    db, rec.seq, max_intronlen=args.intronlength,
                    genome_range=genome_range)
                allpaths = [pt for pt in allpaths
                            if abs(pt.gend - pt.gstart)
                            <= args.totallength]
                if args.direction != "auto":
                    want = (1 if args.direction.startswith("sense")
                            else -1)
                    kept = [pt for pt in allpaths
                            if pt.cdna_direction == want
                            or pt.cdna_direction == 0]
                    allpaths = kept
                path = allpaths[0] if allpaths else None
                cpaths = allpaths
                if chimera_ok and path is not None:
                    ch, chimera_pos = gmap_mod.align_cdna_chimera(
                        db, rec.seq, best=path,
                        max_intronlen=args.intronlength,
                        margin=args.chimera_margin)
                    if chimera_pos is not None:
                        cpaths = ch
            else:
                path = gmap_mod.align_cdna(
                    db, rec.seq, max_intronlen=args.intronlength)
                cpaths = [path] if path is not None else []
            qstr = (
                rec.seq.upper()
                if path is None or path.watsonp
                else dna.revcomp_str(rec.seq.upper())
            )
            if args.format in ("samse", "sampe"):
                if path is None:
                    sys.stdout.write(gmap_out.sam_record(
                        None, rec.label, rec.seq, None, "", 0, qstr, gstr))
                elif chimera_pos is not None:
                    # chimeric halves: hard clips, NH 2, both HI 1,
                    # multimapper MAPQ 3, XT junction tag (gmap.c)
                    xt = "XT:Z:NN-NN,0.00,0.00"
                    for part in cpaths:
                        cn = int(_np.searchsorted(
                            db.chr_ends, part.gstart, side="right"))
                        pq = (rec.seq.upper() if part.watsonp
                              else dna.revcomp_str(rec.seq.upper()))
                        sys.stdout.write(gmap_out.sam_record(
                            part, rec.label, rec.seq, None,
                            db.chr_names[cn], int(db.chr_starts[cn]),
                            pq, gstr, nh=2, hi=1, mapq=3, sm=40,
                            hardclip=True, extra=[xt],
                        ))
                else:
                    # one record per surviving path (up to -n), with
                    # multimapper NH/HI/MAPQ/XQ/X2 (Stage3_recompute_
                    # goodness softmax posterior, stage3.c:3657)
                    mapqs, absmqs, second = gmap_mod.path_mapqs(cpaths)
                    for hi_i, pt in enumerate(cpaths[:maxpaths]):
                        chrnum = int(_np.searchsorted(
                            db.chr_ends, pt.gstart, side="right"))
                        pq = (rec.seq.upper() if pt.watsonp
                              else dna.revcomp_str(rec.seq.upper()))
                        line = gmap_out.sam_record(
                            pt, rec.label, rec.seq, None,
                            db.chr_names[chrnum],
                            int(db.chr_starts[chrnum]), pq, gstr,
                            nh=len(cpaths), hi=hi_i + 1,
                            mapq=mapqs[hi_i], sm=40,
                            xq=absmqs[hi_i], x2=second,
                        )
                        if args.format == "sampe":
                            # sampe sets the paired-read bits on a
                            # single end (gmap.c "setting paired_read
                            # bit")
                            fields = line.split("\t")
                            fields[1] = str(int(fields[1]) | 0x41)
                            line = "\t".join(fields)
                        sys.stdout.write(line)
                continue
            if path is None:
                if args.format == "paths" and not args.compress:
                    sub0 = (f"  [chrsubset: {chrsubset_label}]"
                            if chrsubset_label else "")
                    sys.stdout.write(f">{rec.header}\nPaths (0):{sub0}\n\n")
                    if args.A or args.summary_only or args.continuous_by_exon:
                        # the Alignments section header prints even for
                        # 0 paths (gmap.c print_result -S/-A)
                        sys.stdout.write("Alignments:\n")
                continue
            chrnum = int(
                __import__("numpy").searchsorted(db.chr_ends, path.gstart, side="right")
            )
            chrname = db.chr_names[chrnum]
            chr_start = int(db.chr_starts[chrnum])
            chrlength = int(db.chr_ends[chrnum] - db.chr_starts[chrnum])
            path.chrnum = chrnum
            from ..io import gmap_align_fmt as afmt

            if args.continuous:
                sys.stdout.write(f">{rec.header}\n")
                sys.stdout.write(afmt.continuous_body(path, qstr, gstr))
                continue
            if args.compress:
                sys.stdout.write(gmap_out.compressed_output(
                    path, rec.label, 1, 1, chrname, chr_start,
                    qstr=qstr, gstr=gstr,
                    dbname=db.dbname if dbmode else None))
            elif args.exons:
                sys.stdout.write(afmt.exons_output(
                    path, rec.header, qstr, gstr, args.exons == "genomic"))
            elif args.protein_dna or args.protein_gen:
                sys.stdout.write(afmt.protein_output(
                    path, rec.header, qstr, gstr, args.protein_gen))
            elif args.format == "psl":
                sys.stdout.write(gmap_out.psl_output(
                    path, rec.label, chrname, chr_start, chrlength))
            elif args.format == "splicesites":
                sys.stdout.write(gmap_out.splicesites_output(path, rec.label, chrname))
            elif args.format == "introns":
                sys.stdout.write(gmap_out.introns_output(path, rec.label, chrname))
            elif args.format in ("map_genes", "map_exons"):
                sys.stdout.write(gmap_out.map_output(
                    path, rec.label, rec.header, chrname,
                    args.format == "map_exons", chr_start=chr_start))
            elif args.format in ("gff3_match_cdna", "gff3_match_est"):
                sys.stdout.write(gmap_out.gff3_match(
                    path, 1, rec.label, chrname, db.dbname, qstr, gstr,
                    est=args.format == "gff3_match_est",
                    chr_start=chr_start))
            elif args.format == "coords":
                sys.stdout.write(gmap_out.coords_output(
                    path, rec.header, qstr, gstr, chrname, chr_start))
            elif args.format == "gff3_gene":
                sys.stdout.write(
                    gmap_out.gff3_gene(
                        path, 1, rec.label, chrname, db.dbname, qstr,
                        gstr, chr_start=chr_start
                    )
                )
                sys.stdout.write("###\n")
            else:
                outpaths = cpaths
                chrinfo = None
                if dbmode and chimera_pos is None:
                    chrinfo = []
                    for pt in outpaths[:maxpaths]:
                        pcn = int(_np.searchsorted(
                            db.chr_ends, pt.gstart, side="right"))
                        chrinfo.append((db.chr_names[pcn], int(
                            db.chr_ends[pcn] - db.chr_starts[pcn]),
                            int(db.chr_starts[pcn])))
                sys.stdout.write(
                    gmap_out.paths_output(
                        rec.header, outpaths, chrname, chrlength, qstr,
                        gstr, dbmode, chimera_pos=chimera_pos,
                        read=rec.seq.upper(),
                        maxpaths=None if chimera_pos is not None
                        else maxpaths,
                        chrinfo=chrinfo,
                        dbname=db.dbname if dbmode else None,
                        chr_start=chr_start,
                        chrsubset_label=chrsubset_label,
                    )
                )
                if chimera_pos is None:
                    outpaths = outpaths[:maxpaths]
                if args.A or args.summary_only or args.continuous_by_exon:
                    from ..io import gmap_align_fmt as afmt

                    cname = chrname if dbmode else None
                    codes = db.codes if dbmode else None
                    aa_maps = None
                    if chimera_pos is not None and len(outpaths) > 1:
                        aa_maps = gmap_out.chimera_aa_maps(outpaths, gstr)
                    sys.stdout.write("Alignments:\n")
                    for pi, part in enumerate(outpaths):
                        pq = (rec.seq.upper() if part.watsonp
                              else dna.revcomp_str(rec.seq.upper()))
                        pcn = int(_np.searchsorted(
                            db.chr_ends, part.gstart, side="right"))
                        pcs = int(db.chr_starts[pcn]) if dbmode else chr_start
                        pcname = (db.chr_names[pcn] if dbmode else cname)
                        sys.stdout.write(
                            f"  Alignment for path {pi + 1}:\n\n")
                        sys.stdout.write(afmt.exon_table(
                            part, pcs, pcname if dbmode else cname,
                            codes=codes))
                        sys.stdout.write("\n")
                        if args.continuous_by_exon:
                            sys.stdout.write(afmt.continuous_by_exon_body(
                                part, pq, gstr))
                        elif args.A:
                            sys.stdout.write(afmt.alignment_body(
                                part, pq, gstr, pcs,
                                pcname if dbmode else cname,
                                aa_override=(aa_maps[pi] if aa_maps
                                             else None),
                                wraplength=args.wraplength,
                                ngap=args.introngap,
                                nolengths=args.nolengths))
                if map_iit is not None:
                    sys.stdout.write("Maps:\n")
                    for pi, part in enumerate(outpaths):
                        pcn = int(_np.searchsorted(
                            db.chr_ends, part.gstart, side="right"))
                        sys.stdout.write(gmap_out.map_hits(
                            part, pi + 1, map_iit, args.mapfile,
                            db.chr_names[pcn], int(db.chr_starts[pcn]),
                            bothstrands=args.mapboth,
                            nflanking=args.nflanking,
                            print_comment=args.print_comment))
    return 0


if __name__ == "__main__":
    sys.exit(main())
