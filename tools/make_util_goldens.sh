#!/bin/bash
# Generate byte-parity goldens for the second util-command batch by
# running the reference binary (built at .refbuild/src/metaeuk) on the
# committed fixtures. Outputs into tests/golden/utils/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/utils
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

# --- inputs (committed): protein self-search alignment + prefilter DBs
$REF createdb $DATA/proteins.faa "$TMP/qdb" --shuffle 0 $V
$REF prefilter "$TMP/qdb" "$TMP/qdb" "$TMP/pref" -s 4 $T $V
$REF align "$TMP/qdb" "$TMP/qdb" "$TMP/pref" "$TMP/res" -e 1e-3 -a $T $V
for s in "" .index .dbtype; do
  cp "$TMP/pref$s" "$OUT/selfpref$s"
  cp "$TMP/res$s" "$OUT/selfres$s"
done

# --- swapdb / swapresults
$REF swapdb "$TMP/res" "$TMP/swapdb_res" $T $V
$REF swapresults "$TMP/qdb" "$TMP/qdb" "$TMP/res" "$TMP/swapres" -e 0.001 $T $V
$REF swapresults "$TMP/qdb" "$TMP/qdb" "$TMP/pref" "$TMP/swappref" $T $V

# --- prefixid / suffixid
$REF prefixid "$TMP/res" "$TMP/prefid" $T $V
$REF prefixid "$TMP/res" "$TMP/prefid_tsv" --tsv $T $V
# (prefixid --mapping-file: the reference binary segfaults here; skipped)
$REF suffixid "$TMP/res" "$TMP/sufid" --prefix XX $T $V

# --- subtractdbs (left minus right with evalue gates)
$REF subtractdbs "$TMP/res" "$TMP/res" "$TMP/sub_self" --e-profile 1e-5 -e 1e-5 $T $V
$REF subtractdbs "$TMP/res" "$TMP/pref" "$TMP/sub_pref" --e-profile 100 -e 100 $T $V

# --- summarizeresult
$REF summarizeresult "$TMP/res" "$TMP/summ" $T $V
$REF summarizeresult "$TMP/res" "$TMP/summ_c8" -c 0.8 --overlap 0.3 $T $V

# --- result2flat
$REF result2flat "$TMP/qdb" "$TMP/qdb" "$TMP/res" "$TMP/flat" $V
$REF result2flat "$TMP/qdb" "$TMP/qdb" "$TMP/res" "$TMP/flat_hdr" --use-fasta-header $V

# --- createseqfiledb
$REF createseqfiledb "$TMP/qdb" "$TMP/res" "$TMP/seqfile" $T $V
$REF createseqfiledb "$TMP/qdb" "$TMP/res" "$TMP/seqfile_hh" --hh-format $T $V

# --- splitdb
$REF splitdb "$TMP/res" "$TMP/spl" --split 3 $V
$REF splitdb "$TMP/qdb" "$TMP/splaa" --split 2 --split-aa $V

# --- orftocontig
$REF createdb $DATA/contigs.fna "$TMP/cdb" --shuffle 0 $V
$REF extractorfs "$TMP/cdb" "$TMP/orfs" --orf-start-mode 1 --min-length 15 \
  --contig-start-mode 2 $T $V
$REF orftocontig "$TMP/cdb" "$TMP/orfs" "$TMP/orfaln" $T $V

# --- renamedbkeys (shift keys by 100)
awk -F'\t' '{print $1"\t"($1+100)}' "$TMP/qdb.index" > "$TMP/rename.tsv"
cp "$TMP/rename.tsv" "$OUT/rename.tsv"
$REF renamedbkeys "$TMP/rename.tsv" "$TMP/qdb" "$TMP/renamed" $V

# --- concatdbs
$REF concatdbs "$TMP/qdb" "$TMP/qdb" "$TMP/concat" $T $V
$REF concatdbs "$TMP/res" "$TMP/pref" "$TMP/concat_rp" $T $V

for db in swapdb_res swapres swappref prefid sufid sub_self \
          sub_pref summ summ_c8 seqfile seqfile_hh orfaln concat concat_rp; do
  for s in "" .index .dbtype; do
    [ -f "$TMP/$db$s" ] && cp "$TMP/$db$s" "$OUT/$db$s"
  done
done
for f in prefid_tsv flat flat_hdr; do cp "$TMP/$f" "$OUT/$f"; done
for s in "" .index .dbtype; do
  for i in 0 1 2; do
    [ -f "$TMP/spl_${i}_3$s" ] && cp "$TMP/spl_${i}_3$s" "$OUT/spl_${i}_3$s"
  done
  for i in 0 1; do
    [ -f "$TMP/splaa_${i}_2$s" ] && cp "$TMP/splaa_${i}_2$s" "$OUT/splaa_${i}_2$s"
  done
  cp "$TMP/renamed$s" "$OUT/renamed$s"
  cp "$TMP/renamed_h$s" "$OUT/renamed_h$s"
  cp "$TMP/orfs$s" "$OUT/orfs$s"
  cp "$TMP/orfs_h$s" "$OUT/orfs_h$s"
done
cp "$TMP/renamed.lookup" "$OUT/renamed.lookup" 2>/dev/null || true
echo "goldens written to $OUT"
