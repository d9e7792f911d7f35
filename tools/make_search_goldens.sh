#!/bin/bash
# Byte-parity goldens for the search-workflow family: plain search at the
# workflow defaults (-s 5.7), rbh/result2rbh, map, easy-search, easy-rbh.
# Runs the reference binary (.refbuild/src/metaeuk) on committed fixtures;
# outputs into tests/golden/searchwf/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/searchwf
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

$REF createdb $DATA/queries_lin.faa "$TMP/qdb" --shuffle 0 $V
$REF createdb $DATA/proteins.faa "$TMP/tdb" --shuffle 0 $V

# --- plain search at workflow defaults (blastp.sh single step)
$REF search "$TMP/qdb" "$TMP/tdb" "$TMP/res" "$TMP/stmp" $T $V
for s in "" .index .dbtype; do cp "$TMP/res$s" "$OUT/search$s"; done
PREF=$(find "$TMP/stmp" -name "pref_0" ! -name "*.index" ! -name "*.dbtype" | head -1)
for s in "" .index .dbtype; do cp "$PREF$s" "$OUT/search_pref$s"; done

# --- rbh (A=queries, B=proteins) + intermediates
$REF rbh "$TMP/qdb" "$TMP/tdb" "$TMP/rbh" "$TMP/rtmp" $T $V
for s in "" .index .dbtype; do cp "$TMP/rbh$s" "$OUT/rbh$s"; done
RTMP=$(dirname "$(find "$TMP/rtmp" -name "resAB.dbtype" | head -1)")
for f in resAB resBA resA_best_B resB_best_A resB_best_A_swap \
         res_best_merged res_best_merged_sorted; do
  for s in "" .index .dbtype; do
    cp "$RTMP/$f$s" "$OUT/rbh_$f$s" 2>/dev/null || true
  done
done

# --- result2rbh standalone on the sorted merged DB
$REF result2rbh "$RTMP/res_best_merged_sorted" "$TMP/r2rbh" $T $V
for s in "" .index .dbtype; do cp "$TMP/r2rbh$s" "$OUT/r2rbh$s"; done

# --- map (ungapped align module at map defaults)
$REF map "$TMP/qdb" "$TMP/tdb" "$TMP/map" "$TMP/mtmp" $T $V
for s in "" .index .dbtype; do cp "$TMP/map$s" "$OUT/map$s"; done

# --- easy-search (FASTA in, m8 out)
$REF easy-search $DATA/queries_lin.faa $DATA/proteins.faa \
    "$TMP/easysearch.m8" "$TMP/estmp" $T $V
cp "$TMP/easysearch.m8" "$OUT/easysearch.m8"
$REF easy-search $DATA/queries_lin.faa $DATA/proteins.faa \
    "$TMP/easysearch_greedy.m8" "$TMP/egtmp" --greedy-best-hits $T $V
cp "$TMP/easysearch_greedy.m8" "$OUT/easysearch_greedy.m8"

# --- easy-rbh
$REF easy-rbh $DATA/queries_lin.faa $DATA/proteins.faa \
    "$TMP/easyrbh.m8" "$TMP/ertmp" $T $V
cp "$TMP/easyrbh.m8" "$OUT/easyrbh.m8"

echo "search-workflow goldens written to $OUT"
