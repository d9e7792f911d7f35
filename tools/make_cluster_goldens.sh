#!/bin/bash
# Byte-parity goldens for the cascaded clustering workflow: cluster
# (default 3-step cascade incl. every intermediate), easy-cluster,
# easy-linclust. Runs the reference binary on committed fixtures; outputs
# into tests/golden/clusterwf/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/clusterwf
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

cat $DATA/queries_lin.faa $DATA/proteins.faa > "$TMP/all.faa"
$REF createdb "$TMP/all.faa" "$TMP/qdb" --shuffle 0 $V
cp "$TMP/all.faa" "$OUT/clusterwf_input.faa"

# --- cascaded cluster (default: seqId 0 -> sens 6, 3 steps) + intermediates
$REF cluster "$TMP/qdb" "$TMP/clu" "$TMP/ctmp" $T $V
for s in "" .index .dbtype; do cp "$TMP/clu$s" "$OUT/clu$s"; done
CTMP=$(dirname "$(find "$TMP/ctmp" -name "clu_redundancy.dbtype" | head -1)")
for f in clu_redundancy pref_step0 aln_step0 clu_step0 pref_step1 \
         aln_step1 clu_step1 pref_step2 aln_step2 clu_step2 \
         input_step_redundancy; do
  for s in "" .index .dbtype; do
    cp "$CTMP/$f$s" "$OUT/$f$s" 2>/dev/null || true
  done
done

# --- single-step cluster at high seq-id (automagic: comp-bias 0,
#     min-ungapped 60, sens 1, 1 step)
$REF cluster "$TMP/qdb" "$TMP/clu90" "$TMP/ctmp90" --min-seq-id 0.9 $T $V
for s in "" .index .dbtype; do cp "$TMP/clu90$s" "$OUT/clu90$s"; done

# --- easy-cluster / easy-linclust (FASTA in, 3 files out)
$REF easy-cluster "$TMP/all.faa" "$TMP/ec" "$TMP/ectmp" $T $V
for f in _cluster.tsv _rep_seq.fasta _all_seqs.fasta; do
  cp "$TMP/ec$f" "$OUT/easycluster$f"
done
$REF easy-linclust "$TMP/all.faa" "$TMP/el" "$TMP/eltmp" $T $V
for f in _cluster.tsv _rep_seq.fasta _all_seqs.fasta; do
  cp "$TMP/el$f" "$OUT/easylinclust$f"
done

echo "cluster-workflow goldens written to $OUT"
