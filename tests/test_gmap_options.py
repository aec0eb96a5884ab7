"""gmap option-surface parity: formatting knobs (-l/-i/-N/-5), compute
bounds (-K), input modes (-1/-2, -q) vs the reference binary."""

import os
import pathlib
import subprocess
import sys

import pytest

ORACLE_GMAP = "/tmp/refbuild/src/gmap"
ORACLE_DB = "/tmp/refbuild/trytest/gdb"
REPO = pathlib.Path(__file__).resolve().parent.parent
REF_TESTS = pathlib.Path("/root/reference/tests")

needs_oracle = pytest.mark.skipif(
    not (os.path.exists(ORACLE_GMAP) and os.path.isdir(ORACLE_DB)),
    reason="reference oracle binaries not built",
)


def _run_both(extra, inputs, db=True):
    base = (["-D", ORACLE_DB, "-d", "chr17test"] if db else [])
    ref = subprocess.run(
        [ORACLE_GMAP] + base + extra + [str(f) for f in inputs],
        capture_output=True, text=True, check=True,
    ).stdout
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    mine = subprocess.run(
        [sys.executable, "-m", "gmap_gsnap_tpu.cli.gmap"] + base + extra
        + [str(f) for f in inputs],
        capture_output=True, text=True, env=env, check=True,
    ).stdout
    return ref, mine


@needs_oracle
def test_alignment_format_knobs():
    """-A with non-default wraplength (-l), intron gap dots (-i), and
    suppressed intron lengths (-N)."""
    her2 = REF_TESTS / "ss.her2"
    for extra in (["-A", "-l", "30"], ["-A", "-i", "6"], ["-A", "-N"],
                  ["-A", "-l", "72", "-i", "5", "-N"]):
        ref, mine = _run_both(extra, [her2])
        assert ref.splitlines() == mine.splitlines(), extra


@needs_oracle
def test_md5_header():
    her2 = REF_TESTS / "ss.her2"
    ref, mine = _run_both(["-S", "-5"], [her2])
    assert ref.splitlines() == mine.splitlines()
    assert any("md5:" in l for l in mine.splitlines())


def test_intronlength_bound():
    """-K (maxintronlen_bound) is honored: no emitted intron exceeds
    it.  (Byte parity under severely restrictive -K is not asserted —
    the degenerate path reshuffling differs; the bound semantics are.)"""
    from gmap_gsnap_tpu.align import gmap as gmap_mod
    from gmap_gsnap_tpu.db import build
    from gmap_gsnap_tpu.db.datadir import GenomeDB
    from gmap_gsnap_tpu.io import fasta
    import tempfile

    tmp = tempfile.mkdtemp()
    dbdir = build.build_db([str(REF_TESTS / "ss.chr17test")], "chr17test",
                           tmp, k=12)
    db = GenomeDB.open(dbdir, "chr17test")
    rec = next(fasta.read_fasta(str(REF_TESTS / "ss.her2")))
    for bound in (500, 1500):
        paths = gmap_mod.align_cdna_paths(db, rec.seq, max_intronlen=bound)
        assert paths
        for p in paths:
            for a, b in zip(p.exons, p.exons[1:]):
                assert b.gstart - a.gend <= bound


def test_selfalign_pairalign(tmp_path):
    """-1/-2 input modes.  The reference binary SEGFAULTS on both
    (gmap.c:2165 dereferences the absent genome DB), so no oracle
    parity is possible — assert our implementation aligns correctly."""
    seq = "".join(
        l.strip() for l in open(REF_TESTS / "ss.chr17test")
        if not l.startswith(">")
    ).upper()
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    fa = tmp_path / "two.fa"
    with open(fa, "w") as f:
        f.write(f">gseg\n{seq[100000:102000]}\n")
        f.write(f">qry\n{seq[100400:100900]}\n")
    mine = subprocess.run(
        [sys.executable, "-m", "gmap_gsnap_tpu.cli.gmap", "-2", "-S",
         str(fa)], capture_output=True, text=True, env=env, check=True,
    ).stdout
    assert "Paths (1):" in mine
    assert "query 1..500 (500 bp)" in mine
    one = tmp_path / "one.fa"
    with open(one, "w") as f:
        f.write(f">solo\n{seq[50000:50800]}\n")
    mine = subprocess.run(
        [sys.executable, "-m", "gmap_gsnap_tpu.cli.gmap", "-1", "-S",
         str(one)], capture_output=True, text=True, env=env, check=True,
    ).stdout
    assert "Paths (1):" in mine
    assert "query 1..800 (800 bp)" in mine
    assert "100.0 (800 matches, 0 mismatches" in mine


@needs_oracle
def test_part_sharding(tmp_path):
    seq = "".join(
        l.strip() for l in open(REF_TESTS / "ss.chr17test")
        if not l.startswith(">")
    ).upper()
    fa = tmp_path / "many.fa"
    with open(fa, "w") as f:
        for i in range(4):
            f.write(f">m{i}\n{seq[10000 + 5000 * i : 10600 + 5000 * i]}\n")
    ref, mine = _run_both(["-S", "-q", "1/2"], [fa])
    assert ref.splitlines() == mine.splitlines()


@needs_oracle
def test_fulllength_translation():
    """-F starts the reported translation at the first Met."""
    her2 = REF_TESTS / "ss.her2"
    for extra in (["-S"], ["-S", "-F"]):
        ref, mine = _run_both(extra, [her2])
        assert ref.splitlines() == mine.splitlines(), extra


@needs_oracle
def test_direction_filter():
    """-z sense_filter / antisense_filter keep only matching-direction
    paths."""
    her2 = REF_TESTS / "ss.her2"
    for extra in (["-S", "-z", "sense_filter"],
                  ["-S", "-z", "antisense_filter"]):
        ref, mine = _run_both(extra, [her2])
        assert ref.splitlines() == mine.splitlines(), extra


@needs_oracle
def test_map_annotation(tmp_path):
    """-m map IIT annotation: signed/both-strand hits, flanking (-u),
    and --print-comment, byte-compared."""
    import shutil

    src = pathlib.Path(ORACLE_DB) / "chr17test"
    dbdir = tmp_path / "gdb" / "chr17test"
    shutil.copytree(src, dbdir, ignore=shutil.ignore_patterns("*.maps"))
    maps = dbdir / "chr17test.maps"
    maps.mkdir()
    from gmap_gsnap_tpu.db.iit_text import iit_from_text

    # entries around the HER2 locus (109781..138442), both strands,
    # flanking entries on each side
    txt = (
        ">geneA chr17test:100000..105000 note A\n"
        ">geneB chr17test:112000..118000 in-span plus\n"
        ">geneC chr17test:125000..120000 in-span minus\n"
        ">geneD chr17test:130000..131000 in-span plus2\n"
        ">geneE chr17test:150000..155000 right flank\n"
    )
    iit_from_text(txt).write(str(maps / "mymap.iit"))
    her2 = REF_TESTS / "ss.her2"
    gdb = str(tmp_path / "gdb")
    for extra in (["-m", "mymap"], ["-m", "mymap", "-b"],
                  ["-m", "mymap", "-u", "1"],
                  ["-m", "mymap", "--print-comment"]):
        args = ["-D", gdb, "-d", "chr17test", "-S"] + extra
        ref = subprocess.run(
            [ORACLE_GMAP] + args + [str(her2)],
            capture_output=True, text=True, check=True).stdout
        env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
        mine = subprocess.run(
            [sys.executable, "-m", "gmap_gsnap_tpu.cli.gmap"] + args
            + [str(her2)], capture_output=True, text=True, env=env,
            check=True).stdout
        assert ref.splitlines() == mine.splitlines(), extra


@needs_oracle
def test_short_and_empty_sequence(tmp_path):
    fa = tmp_path / "short.fa"
    fa.write_text(">tiny\nACGTACG\n>ok\n" + _genome_seq_gm()[20000:20400]
                  + "\n")
    for extra in (["-S"], []):
        ref, mine = _run_both(extra, [fa])
        assert ref.splitlines() == mine.splitlines(), extra


def _genome_seq_gm():
    return "".join(
        l.strip() for l in open(REF_TESTS / "ss.chr17test")
        if not l.startswith(">")
    ).upper()
