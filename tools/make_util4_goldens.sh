#!/bin/bash
# Goldens for util batch 4 (align/clust/mergeclusters/translateaa/
# compress/decompress/dbtype) from the reference binary at
# .refbuild/src/metaeuk. Outputs into tests/golden/util4/.
#
# Also verifies interop at generation time: the reference binary must
# decompress OUR compressed DB back to the original bytes (zstd frame
# bytes differ between zstd 1.3.8 (vendored) and the system 1.5.4, so
# only .index/.dbtype are committed as byte goldens for compress).
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/util4
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

$REF createdb $DATA/proteins.faa "$TMP/qdb" --shuffle 0 $V

# --- clust on the committed selfres alignment DB + selfpref
for s in "" .index .dbtype; do
  cp tests/golden/utils/selfres$s "$TMP/res$s"
  cp tests/golden/utils/selfpref$s "$TMP/pref$s"
done
$REF clust "$TMP/qdb" "$TMP/res" "$TMP/clu_aln" $T $V
$REF clust "$TMP/qdb" "$TMP/pref" "$TMP/clu_pref" $T $V
for s in "" .index .dbtype; do
  cp "$TMP/clu_aln$s" "$OUT/clu_aln$s"
  cp "$TMP/clu_pref$s" "$OUT/clu_pref$s"
done

# --- mergeclusters: two cascaded steps (reps of step1 re-clustered at
# lower sensitivity among themselves)
cut -f1 "$TMP/clu_aln.index" > "$TMP/reps.tsv"
$REF createsubdb "$TMP/reps.tsv" "$TMP/qdb" "$TMP/repdb" $V
$REF prefilter "$TMP/repdb" "$TMP/repdb" "$TMP/rp" -s 6 $T $V
$REF align "$TMP/repdb" "$TMP/repdb" "$TMP/rp" "$TMP/rres" -e 1e-2 $T $V
$REF clust "$TMP/repdb" "$TMP/rres" "$TMP/clu2" $T $V
$REF mergeclusters "$TMP/qdb" "$TMP/merged" "$TMP/clu_aln" "$TMP/clu2" $T $V
for s in "" .index .dbtype; do
  cp "$TMP/clu2$s" "$OUT/clu2$s"
  cp "$TMP/merged$s" "$OUT/merged$s"
done

# --- translateaa
$REF translateaa "$TMP/qdb" "$TMP/aa2nucl" $T $V
for s in "" .index .dbtype; do cp "$TMP/aa2nucl$s" "$OUT/aa2nucl$s"; done

# --- compress / decompress (ref-compressed DB is a read-parity golden)
$REF compress "$TMP/res" "$TMP/res_c" $T $V
$REF decompress "$TMP/res_c" "$TMP/res_d" $T $V
cmp "$TMP/res_d" "$TMP/res"   # sanity
for s in "" .index .dbtype; do cp "$TMP/res_c$s" "$OUT/res_c$s"; done

# interop: our compress must be readable by the reference binary
python -m metaeuk_tpu.cli compress "$TMP/res" "$TMP/res_c2"
$REF decompress "$TMP/res_c2" "$TMP/res_d2" $T $V
cmp "$TMP/res_d2" "$TMP/res"
cmp "$TMP/res_c2.index" "$TMP/res_c.index"
echo "interop OK: reference decompressed our compressed DB byte-exactly"

echo "goldens written to $OUT"
