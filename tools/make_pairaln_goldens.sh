#!/bin/bash
# Byte-parity goldens for pairaln (+ fwbw input fixture). The target DB
# gets taxonomy annotations from the committed toy taxdump; the query DB
# is built from TWO fasta files so the .lookup fileNumber grouping is
# exercised. Outputs into tests/golden/util11/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/util11
DATA=tests/data
TAX=tests/golden/tax
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

cpdb() { for s in "" .index .dbtype; do cp "$1$s" "$2$s" 2>/dev/null || true; done; }

# two source files -> two lookup file groups
head -20 $DATA/queries_lin.faa > "$TMP/q1.faa"
tail -n +21 $DATA/queries_lin.faa > "$TMP/q2.faa"
$REF createdb "$TMP/q1.faa" "$TMP/q2.faa" "$TMP/qdb" --shuffle 0 $V
cp "$TMP/qdb.lookup" "$OUT/qdb.lookup"
$REF createdb $DATA/proteins.faa "$TMP/tdb" --shuffle 0 $V
$REF createtaxdb "$TMP/tdb" "$TMP/taxtmp" --ncbi-tax-dump "$TAX/taxdump" \
    --tax-mapping-file "$TAX/tax_mapping.tsv" $V
cp "$TMP/tdb_mapping" "$OUT/tdb_mapping"
cpdb "$TMP/tdb_h" "$OUT/tdb_h"
$REF prefilter "$TMP/qdb" "$TMP/tdb" "$TMP/pref" -s 4 $T $V
$REF align "$TMP/qdb" "$TMP/tdb" "$TMP/pref" "$TMP/aln" -e 1e-3 -a $T $V
cpdb "$TMP/aln" "$OUT/aln"

$REF pairaln "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/paired" $T $V
cpdb "$TMP/paired" "$OUT/paired"
$REF pairaln "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/paired_dummy" $T $V \
    --pairing-dummy-mode 1
cpdb "$TMP/paired_dummy" "$OUT/paired_dummy"
$REF pairaln "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/paired_cover" $T $V \
    --pairing-mode 1
cpdb "$TMP/paired_cover" "$OUT/paired_cover"
$REF pairaln "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/paired_prox" $T $V \
    --pairing-filter 1
cpdb "$TMP/paired_prox" "$OUT/paired_prox"
$REF pairaln "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/paired_prox_dummy" \
    $T $V --pairing-filter 1 --pairing-dummy-mode 1
cpdb "$TMP/paired_prox_dummy" "$OUT/paired_prox_dummy"

# no-backtrace alignment input (hasBacktrace=false path)
$REF align "$TMP/qdb" "$TMP/tdb" "$TMP/pref" "$TMP/alnnb" -e 1e-3 $T $V
cpdb "$TMP/alnnb" "$OUT/alnnb"
$REF pairaln "$TMP/qdb" "$TMP/tdb" "$TMP/alnnb" "$TMP/paired_nb" $T $V
cpdb "$TMP/paired_nb" "$OUT/paired_nb"

# fwbw over the backtraced alignment DB
$REF fwbw "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/fwbwout" $T $V \
  && cpdb "$TMP/fwbwout" "$OUT/fwbwout" || echo FAILED > "$OUT/fwbw.SKIPPED"

echo "pairaln goldens written to $OUT"
