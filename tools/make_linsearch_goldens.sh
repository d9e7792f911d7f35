#!/bin/bash
# Goldens for createlinindex/kmersearch/linsearch from the reference
# binary. Queries (tests/data/queries_lin.faa) are fragments/mutants/
# deletion variants of tests/data/proteins.faa so both the ungapped
# filter branch and the gapped align+swap branch carry hits.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/linsearch
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

$REF createdb $DATA/proteins.faa "$TMP/tdb" --shuffle 0 $V
$REF createdb $DATA/queries_lin.faa "$TMP/qdb" --shuffle 0 $V
mkdir -p "$TMP/itmp" "$TMP/stmp"
$REF createlinindex "$TMP/tdb" "$TMP/itmp" $T $V
$REF kmersearch "$TMP/qdb" "$TMP/tdb.linidx" "$TMP/pref" --kmer-per-seq 21 \
  --seed-sub-mat 'aa:blosum62.out,nucl:nucleotide.out' $T $V
$REF linsearch "$TMP/qdb" "$TMP/tdb" "$TMP/lout" "$TMP/stmp" $T $V

for s in "" .index .dbtype; do
  cp "$TMP/pref$s" "$OUT/pref$s"
  cp "$TMP/lout$s" "$OUT/lout$s"
done
# stage intermediates for debugging parity breaks
D=$(find "$TMP/stmp" -name "reverse_aln" | head -1 | xargs dirname)
for f in reverse_ungapaln reverse_aln; do
  for s in "" .index .dbtype; do
    cp "$D/$f$s" "$OUT/$f$s"
  done
done
echo "goldens written to $OUT"
