#!/bin/bash
# Goldens for the standalone resultspercontig / collectoptimalset commands:
# replay metaeuk predictexons --threads 1 on the two-contig fixture and
# harvest the stage DBs (search_res as the command input, plus the
# search_res_by_contig and dp_predictions outputs).
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/percontig
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"

$REF createdb "$DATA/contigs.fna" "$TMP/contigs" -v 0
$REF createdb "$DATA/proteins.faa" "$TMP/targets" -v 0
$REF predictexons "$TMP/contigs" "$TMP/targets" "$TMP/preds" "$TMP/tmp" \
    --threads 1 -v 0

WORK=$(ls -d "$TMP"/tmp/*/ | head -1)
cpdb() { for s in "" .index .dbtype; do cp "$1$s" "$2$s" 2>/dev/null || true; done; }

cpdb "$WORK/search_res" "$OUT/search_res"
cpdb "$WORK/search_res_by_contig" "$OUT/by_contig"
cpdb "$TMP/preds" "$OUT/dp_preds"

# standalone invocations on the same intermediates must agree with the
# workflow-harvested outputs
$REF resultspercontig "$TMP/contigs" "$WORK/nucl_6f" "$WORK/search_res" \
    "$TMP/bc2" --threads 1 -v 0
cmp "$TMP/bc2" "$OUT/by_contig"
$REF collectoptimalset "$TMP/bc2" "$TMP/targets" "$TMP/dp2" --threads 1 -v 0
cmp "$TMP/dp2" "$OUT/dp_preds"

echo "percontig goldens written to $OUT"
