#!/bin/bash
# Byte-parity goldens for the increasing-sensitivity multi-pass search
# (blastp.sh STEPS loop, Search.cpp:520-546): reference `search` with
# --start-sens/--sens-steps on the queries_steps/proteins fixture (easy + heavily mutated + random queries so later passes really run).
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/senssteps
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

$REF createdb $DATA/queries_steps.faa "$TMP/qdb" --shuffle 0 $V
$REF createdb $DATA/proteins.faa "$TMP/tdb" --shuffle 0 $V

# 3 steps from sens 1 to 7.5 (SENSE = 1.0, 4.2, 7.5)
$REF search "$TMP/qdb" "$TMP/tdb" "$TMP/res3" "$TMP/stmp3" \
    --start-sens 1 --sens-steps 3 -s 7.5 $T $V
for s in "" .index .dbtype; do cp "$TMP/res3$s" "$OUT/steps3$s"; done
STMP=$(dirname "$(find "$TMP/stmp3" -name "aln_0.dbtype" | head -1)")
for f in pref_0 aln_0 pref_1 aln_1; do
  for s in "" .index .dbtype; do
    cp "$STMP/$f$s" "$OUT/steps3_$f$s" 2>/dev/null || true
  done
done

# 2 steps from sens 2 to 7 (SENSE = 2.0, 7.0)
$REF search "$TMP/qdb" "$TMP/tdb" "$TMP/res2" "$TMP/stmp2" \
    --start-sens 2 --sens-steps 2 -s 7 $T $V
for s in "" .index .dbtype; do cp "$TMP/res2$s" "$OUT/steps2$s"; done

echo "sensitivity-stepping goldens written to $OUT"
