#!/bin/bash
# filterdb-mode goldens from the reference binary over the committed
# self-search alignment DB (tests/golden/utils/selfres).
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/utils
RES=$OUT/selfres
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
V="-v 0"
T="--threads 1"

$REF filterdb "$RES" "$TMP/f_lines" --extract-lines 2 $T $V
$REF filterdb "$RES" "$TMP/f_ge" --filter-column 2 --comparison-operator ge \
  --comparison-value 100 $T $V
$REF filterdb "$RES" "$TMP/f_le" --filter-column 4 --comparison-operator le \
  --comparison-value 1e-30 $T $V
$REF filterdb "$RES" "$TMP/f_regex" --filter-column 3 \
  --filter-regex '^0\.9' $T $V
$REF filterdb "$RES" "$TMP/f_trim" --filter-column 2 \
  --trim-to-one-column $T $V
$REF filterdb "$RES" "$TMP/f_sort_inc" --filter-column 2 \
  --sort-entries 1 $T $V
$REF filterdb "$RES" "$TMP/f_sort_dec" --filter-column 4 \
  --sort-entries 2 $T $V
$REF filterdb "$RES" "$TMP/f_beats" --filter-column 2 --beats-first \
  --comparison-operator ip --comparison-value 0.5 $T $V
printf '1\n3\n5\n' > "$TMP/keys.txt"
cp "$TMP/keys.txt" "$OUT/f_keys.txt"
$REF filterdb "$RES" "$TMP/f_file_pos" --filter-file "$TMP/keys.txt" $T $V
$REF filterdb "$RES" "$TMP/f_file_neg" --filter-file "$TMP/keys.txt" \
  --positive-filter 0 $T $V
printf '1\tONE\n3\tTHREE\n3\tDREI\n' > "$TMP/map.tsv"
cp "$TMP/map.tsv" "$OUT/f_map.tsv"
$REF filterdb "$RES" "$TMP/f_map" --mapping-file "$TMP/map.tsv" $T $V
$REF filterdb "$RES" "$TMP/f_join" --join-db "$RES" $T $V
$REF filterdb "$RES" "$TMP/f_expr" --filter-expression '$2 > 150' $T $V

for db in f_lines f_ge f_le f_regex f_trim f_sort_inc f_sort_dec f_beats \
          f_file_pos f_file_neg f_map f_join f_expr; do
  for s in "" .index .dbtype; do cp "$TMP/$db$s" "$OUT/$db$s"; done
done
echo "filterdb goldens written"
