#!/bin/bash
# offsetalignment + proteinaln2nucl goldens from the reference binary.
# Scenario: translated search of contig ORFs vs the protein fixture
# (contigs.fna six-frame -> align vs proteins.faa), then
# offsetalignment back to contig coordinates. proteinaln2nucl re-scores
# an ORF-vs-ORF nucleotide pair through its protein alignment (gaps 7/1
# to hit the precomputed Gumbel table).
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/utils
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
V="-v 0"
T="--threads 1"

$REF createdb $DATA/contigs.fna "$TMP/cdb" --shuffle 0 $V
$REF createdb $DATA/proteins.faa "$TMP/tdb" --shuffle 0 $V
$REF extractorfs "$TMP/cdb" "$TMP/orfs" --orf-start-mode 1 --min-length 15 \
  --contig-start-mode 2 $T $V
$REF translatenucs "$TMP/orfs" "$TMP/orfsaa" $T $V
$REF prefilter "$TMP/orfsaa" "$TMP/tdb" "$TMP/pref" -s 4 $T $V
$REF align "$TMP/orfsaa" "$TMP/tdb" "$TMP/pref" "$TMP/aln" -e 100 -a $T $V
for s in "" .index .dbtype; do cp "$TMP/aln$s" "$OUT/orfaa_aln$s"; done

# translated offsetting: query side only (protein target)
$REF offsetalignment "$TMP/cdb" "$TMP/orfs" "$TMP/tdb" "$TMP/tdb" \
  "$TMP/aln" "$TMP/offaln" $T $V
for s in "" .index .dbtype; do cp "$TMP/offaln$s" "$OUT/offaln$s"; done

# proteinaln2nucl: ORF-nucl self search through the protein alignment
$REF prefilter "$TMP/orfsaa" "$TMP/orfsaa" "$TMP/spref" -s 4 $T $V
$REF align "$TMP/orfsaa" "$TMP/orfsaa" "$TMP/spref" "$TMP/saln" -e 1e-5 \
  -a $T $V
for s in "" .index .dbtype; do cp "$TMP/saln$s" "$OUT/orfself_aln$s"; done
$REF proteinaln2nucl "$TMP/orfs" "$TMP/orfs" "$TMP/orfsaa" "$TMP/orfsaa" \
  "$TMP/saln" "$TMP/p2n" $T $V
for s in "" .index .dbtype; do cp "$TMP/p2n$s" "$OUT/p2n$s"; done
echo "offsetaln goldens written"

# nucl-nucl (--search-type 3) with extractframes query + split target,
# the deterministic blastn.sh configuration (unsplit targets read
# uninitialized SequenceLocation fields in the reference)
$REF extractframes "$TMP/cdb" "$TMP/qf" --forward-frames 1 \
  --reverse-frames 1 $T $V
$REF splitsequence "$TMP/qf" "$TMP/qs" --max-seq-len 500 \
  --sequence-overlap 100 $T $V
$REF splitsequence "$TMP/cdb" "$TMP/ts" --max-seq-len 700 \
  --sequence-overlap 150 $T $V
$REF prefilter "$TMP/qs" "$TMP/ts" "$TMP/npref" $T $V
$REF align "$TMP/qs" "$TMP/ts" "$TMP/npref" "$TMP/naln" -e 0.001 -a $T $V
for s in "" .index .dbtype; do cp "$TMP/naln$s" "$OUT/nucl_aln$s"; done
for db in qs ts; do
  for s in "" .index .dbtype _h _h.index _h.dbtype; do
    cp "$TMP/$db$s" "$OUT/nucl_$db$s"
  done
done
$REF offsetalignment "$TMP/cdb" "$TMP/qs" "$TMP/cdb" "$TMP/ts" \
  "$TMP/naln" "$TMP/noff" --search-type 3 $T $V
for s in "" .index .dbtype; do cp "$TMP/noff$s" "$OUT/nucl_offaln$s"; done
echo "nucl offsetaln goldens written"
for s in "" .index .dbtype; do cp "$TMP/npref$s" "$OUT/nucl_pref$s"; done
$REF prefilter "$TMP/qs" "$TMP/ts" "$TMP/npref15" -k 15 $T $V
for s in "" .index .dbtype; do cp "$TMP/npref15$s" "$OUT/nucl_pref15$s"; done
