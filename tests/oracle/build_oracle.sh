#!/bin/sh
# Build the reference GMAP/GSNAP binaries as a golden-output oracle.
# The snapshot omits genome_hr.c; our re-derived implementation
# (tests/oracle/genome_hr.c) completes the build.  Also builds the
# chr17test database under /tmp/refbuild/trytest/gdb.
set -e
BUILD=/tmp/refbuild
REF=/root/reference
HERE=$(cd "$(dirname "$0")" && pwd)

mkdir -p $BUILD
cd $BUILD
test -f Makefile || $REF/configure --prefix=/tmp/refinstall > configure.log 2>&1
cp "$HERE/genome_hr.c" src/
make -j8 > make.log 2>&1 || { tail -20 make.log; exit 1; }

mkdir -p trytest/db trytest/gdb/chr17test
cd trytest/db
$BUILD/util/fa_coords -o coords.txt $REF/tests/ss.chr17test > /dev/null 2>&1
$BUILD/util/gmap_process -c coords.txt $REF/tests/ss.chr17test > gproc.fa 2>/dev/null
$BUILD/src/gmapindex -d chr17test -A < gproc.fa > /dev/null 2>&1
$BUILD/src/gmapindex -d chr17test -G < gproc.fa > /dev/null 2>&1
cat chr17test.genomecomp | $BUILD/src/gmapindex -d chr17test -O -k 12 > /dev/null 2>&1
cat chr17test.genomecomp | $BUILD/src/gmapindex -d chr17test -P -k 12 > /dev/null 2>&1
cp chr17test.* ../gdb/chr17test/
echo chr17test > ../gdb/chr17test/chr17test.version

# sanity: goldens
cmp chr17test.genomecomp $REF/tests/setup.genomecomp.ok
cmp chr17test.ref123positions $REF/tests/setup.ref123positions.ok
$BUILD/src/gmap -D ../gdb -d chr17test $REF/tests/ss.her2 2>/dev/null | cmp - $REF/tests/map.test.ok
echo "oracle ready"
