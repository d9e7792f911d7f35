#!/bin/bash
# Byte-parity goldens for sequence2profile. The reference binary must be
# rebuilt with the synthetic CRF context library baked in as K4000.crf
# (its real model is a missing LFS blob upstream):
#   python tools/make_crf_fixture.py
#   cp -r /root/reference .refsrc && chmod -R u+w .refsrc
#   cp tests/data/tiny.crf .refsrc/lib/mmseqs/data/resources/K4000.crf
#   printf '>s\nACD\n' > .refsrc/lib/mmseqs/examples/DB.fasta
#   cmake -B .refbuild -S .refsrc -GNinja -DHAVE_SSE4_1=1 -DNATIVE_ARCH=0 \
#         -DCMAKE_BUILD_TYPE=Release && ninja -C .refbuild metaeuk
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/util9
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

$REF createdb "$DATA/proteins.faa" "$TMP/qdb" $V

cpout() { for s in "" .index .dbtype; do cp "$1$s" "$2$s"; done; }

# exposed params here: --pca --pcb --neff --tau (Parameters.cpp:550-557);
# maskProfile stays at its default 1 and pcmode at 0
$REF sequence2profile "$TMP/qdb" "$TMP/s2p" $V $T
cpout "$TMP/s2p" "$OUT/s2p"

$REF sequence2profile "$TMP/qdb" "$TMP/s2p_tau" $V $T --tau 0.35
cpout "$TMP/s2p_tau" "$OUT/s2p_tau"

rm -f "$OUT/s2p.SKIPPED"
echo "sequence2profile goldens written to $OUT"
