#!/bin/bash
# Goldens for the enrich workflow. The reference `enrich` COMMAND is
# broken upstream in this version (it declares 4 input paths,
# MMseqsBase.cpp:1191, but enrich.sh requires 6 and Enrich.cpp reads
# par.db6), so the goldens replay enrich.sh's exact command chain with
# the Enrich.cpp parameter schedule (expansionMode=1, addBacktrace,
# step e-values evalProfile..evalProfile..evalue) through the reference
# binary's individual commands. Outputs into tests/golden/enrich/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/enrich
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

cpdb() { for s in "" .index .dbtype; do cp "$1$s" "$2$s" 2>/dev/null || true; done; }

cat $DATA/queries_lin.faa $DATA/proteins.faa > "$TMP/all.faa"
$REF createdb "$TMP/all.faa" "$TMP/alldb" --shuffle 0 $V
$REF createdb $DATA/queries_lin.faa "$TMP/qdb" --shuffle 0 $V
$REF prefilter "$TMP/alldb" "$TMP/alldb" "$TMP/spref" -s 4 $T $V
$REF align "$TMP/alldb" "$TMP/alldb" "$TMP/spref" "$TMP/saln" -e 1e-3 -a $T $V
$REF result2profile "$TMP/alldb" "$TMP/alldb" "$TMP/saln" "$TMP/profdb" $T $V
$REF profile2consensus "$TMP/profdb" "$TMP/profdb_consensus" $T $V
cpdb "$TMP/saln" "$OUT/saln"
cpdb "$TMP/profdb" "$OUT/profdb"
for s in _h _h.index _h.dbtype; do cp "$TMP/profdb$s" "$OUT/profdb$s"; done
cpdb "$TMP/profdb_consensus" "$OUT/profdb_consensus"

# enrich.sh: slice search + initial query profiles
$REF search "$TMP/qdb" "$TMP/profdb" "$TMP/search_slice" "$TMP/slice_tmp" \
    --exhaustive-search --num-iterations 1 -a -e 0.001 $T $V
$REF result2profile "$TMP/qdb" "$TMP/profdb" "$TMP/search_slice" \
    "$TMP/prof_slice" $T $V
cpdb "$TMP/search_slice" "$OUT/search_slice"
cpdb "$TMP/prof_slice" "$OUT/prof_slice"

INPUT="$TMP/prof_slice"
NUM_IT=3
STEP=0
while [ "$STEP" -lt "$NUM_IT" ]; do
  if [ "$STEP" -eq "$((NUM_IT-1))" ]; then EV=0.001; else EV=0.1; fi
  $REF prefilter "$INPUT" "$TMP/profdb_consensus" "$TMP/pref_$STEP" \
      -s 4 $T $V
  if [ "$STEP" -ge 1 ]; then
    $REF subtractdbs "$TMP/pref_$STEP" "$TMP/aln_0" \
        "$TMP/pref_next_$STEP" -e 0.001 $T $V
    for s in "" .index .dbtype; do
      mv -f "$TMP/pref_next_$STEP$s" "$TMP/pref_$STEP$s"
    done
  fi
  $REF align "$INPUT" "$TMP/profdb_consensus" "$TMP/pref_$STEP" \
      "$TMP/aln_$STEP" -e "$EV" -a $T $V
  $REF expandaln "$INPUT" "$TMP/alldb" "$TMP/aln_$STEP" "$TMP/saln" \
      "$TMP/aln_exp_$STEP" --expansion-mode 1 -e "$EV" $T $V
  for s in "" .index .dbtype; do
    mv -f "$TMP/aln_exp_$STEP$s" "$TMP/aln_$STEP$s"
  done
  if [ "$STEP" -gt 0 ]; then
    $REF mergedbs "$INPUT" "$TMP/aln_new" "$TMP/aln_0" "$TMP/aln_$STEP" $V
    for s in "" .index .dbtype; do
      mv -f "$TMP/aln_new$s" "$TMP/aln_0$s"
    done
  fi
  $REF result2profile "$TMP/qdb" "$TMP/alldb" "$TMP/aln_0" \
      "$TMP/profile_$STEP" $T $V
  INPUT="$TMP/profile_$STEP"
  STEP=$((STEP+1))
done
cpdb "$TMP/aln_0" "$OUT/enriched"

echo "enrich goldens written to $OUT"
