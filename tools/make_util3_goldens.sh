#!/bin/bash
# Goldens for the third util batch: result2repseq, masksequence, gff2db,
# maskbygff, result2stats, apply, diffseqdbs.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/utils
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
V="-v 0"
T="--threads 1"

$REF createdb $DATA/proteins.faa "$TMP/qdb" --shuffle 0 $V
$REF createdb $DATA/contigs.fna "$TMP/cdb" --shuffle 0 $V
RES=$OUT/selfres

$REF result2repseq "$TMP/qdb" "$RES" "$TMP/repseq" $T $V
for s in "" .index .dbtype; do cp "$TMP/repseq$s" "$OUT/repseq$s"; done

$REF masksequence "$TMP/qdb" "$TMP/maskaa" $T $V
$REF masksequence "$TMP/cdb" "$TMP/masknt" $T $V
for s in "" .index .dbtype; do
  cp "$TMP/maskaa$s" "$OUT/maskaa$s"
  cp "$TMP/masknt$s" "$OUT/masknt$s"
done

# GFF fixture over the contig fixture
cat > "$TMP/test.gff" <<'GFF'
##gff-version 3
contigA	test	gene	100	400	.	+	.	ID=gene1
contigA	test	CDS	120	360	.	+	.	ID=cds1
contigA	test	gene	600	900	.	-	.	ID=gene2
contigB	test	CDS	50	500	.	+	.	ID=cds2
contigB	test	exon	200	340	.	-	.	ID=exon1
GFF
cp "$TMP/test.gff" "$OUT/test.gff"
$REF gff2db "$TMP/test.gff" "$TMP/cdb" "$TMP/gffdb" $T $V
$REF gff2db "$TMP/test.gff" "$TMP/cdb" "$TMP/gffcds" --gff-type CDS $T $V
for db in gffdb gffcds; do
  for s in "" .index .dbtype _h _h.index _h.dbtype .lookup .source; do
    [ -f "$TMP/$db$s" ] && cp "$TMP/$db$s" "$OUT/$db$s"
  done
done

# (maskbygff: the reference requires string-keyed DBs and errors on
# standard numeric-key DBs; contract-level only)

for st in linecount firstline mean sum max min; do
  $REF result2stats "$TMP/qdb" "$TMP/qdb" "$RES" "$TMP/st_$st" --stat $st $T $V
  for s in "" .index .dbtype; do
    [ -f "$TMP/st_$st$s" ] && cp "$TMP/st_$st$s" "$OUT/st_$st$s"
  done
done

$REF apply "$RES" "$TMP/applied" $T $V -- head -n 1
for s in "" .index .dbtype; do cp "$TMP/applied$s" "$OUT/applied$s"; done

# diffseqdbs: new DB = subset of qdb with one extra sequence
head -14 $DATA/proteins.faa > "$TMP/sub.faa"
printf '>EXTRA\nMAGICHANDS\n' >> "$TMP/sub.faa"
$REF createdb "$TMP/sub.faa" "$TMP/ndb" --shuffle 0 $V
$REF diffseqdbs "$TMP/qdb" "$TMP/ndb" "$TMP/d.removed" "$TMP/d.kept" "$TMP/d.new" $T $V
for f in d.removed d.kept d.new; do cp "$TMP/$f" "$OUT/$f"; done
cp "$TMP/sub.faa" "$OUT/diff_sub.faa"
echo "util3 goldens written"

# --- result2msa goldens (appended)
$REF result2msa "$TMP/qdb" "$TMP/qdb" "$RES" "$TMP/msa_fasta" $T $V
$REF result2msa "$TMP/qdb" "$TMP/qdb" "$RES" "$TMP/msa_sto" --msa-format-mode 4 $T $V
$REF result2msa "$TMP/qdb" "$TMP/qdb" "$RES" "$TMP/msa_filt" --filter-msa 1 $T $V
for s in "" .index .dbtype; do
  cp "$TMP/msa_fasta$s" "$OUT/msa_fasta$s"
  [ -f "$TMP/msa_filt$s" ] && cp "$TMP/msa_filt$s" "$OUT/msa_filt$s"
done
cp "$TMP/msa_sto" "$OUT/msa_sto"
