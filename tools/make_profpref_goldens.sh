#!/bin/bash
# Goldens for the profile-query k-mer prefilter (blastpgp/profile-query
# role): reference `prefilter profileDB targetDB` over the committed
# profile fixture, plus an iterative-search e2e golden.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/pref
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
V="-v 0"
T="--threads 1"

$REF createdb $DATA/proteins.faa "$TMP/tdb" --shuffle 0 $V

$REF prefilter tests/golden/profile/profileDB "$TMP/tdb" "$OUT/profq_pref" $T $V
rm -f "$OUT/profq_pref.done"

# iterative profile search e2e (blastpgp.sh), 2 and 3 iterations
$REF createdb $DATA/proteins.faa "$TMP/qdb" --shuffle 0 $V
for it in 2 3; do
  mkdir -p "$TMP/it$it"
  $REF search "$TMP/qdb" "$TMP/tdb" "$TMP/res$it" "$TMP/it$it" \
    --num-iterations $it -a $T $V
  for s in "" .index .dbtype; do cp "$TMP/res$it$s" "$OUT/iter$it$s"; done
done

# iterative search over the mutated-family fixture (profiles recruit
# remote members)
for it in 2 3; do
  mkdir -p "$TMP/fam$it"
  $REF search tests/golden/pref/pfQ tests/golden/pref/pfT "$TMP/famres$it" \
    "$TMP/fam$it" --num-iterations $it -a $T $V
  for s in "" .index .dbtype; do
    cp "$TMP/famres$it$s" "$OUT/iterfam$it$s"
  done
done
