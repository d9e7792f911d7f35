#!/bin/bash
# Byte-parity goldens for k-mer size 7: the reference binary forced to
# -k 7 on the committed pfQ/pfT fixture (the auto rule picks 7 above
# 3.35G residues, IndexTable.h:439-449; forcing -k exercises the same
# [2,2,3] generator path at fixture scale).
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/pref
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
V="-v 0"

$REF prefilter "$OUT/pfQ" "$OUT/pfT" "$TMP/k7" -k 7 --threads 1 $V
for s in "" .index .dbtype; do cp "$TMP/k7$s" "$OUT/pfres_k7$s"; done
$REF prefilter "$OUT/pfQ" "$OUT/pfT" "$TMP/k7s7" -k 7 -s 7.5 --threads 1 $V
for s in "" .index .dbtype; do cp "$TMP/k7s7$s" "$OUT/pfres_k7_s7.5$s"; done
echo wrote "$OUT/pfres_k7" "$OUT/pfres_k7_s7.5"
