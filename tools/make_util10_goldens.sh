#!/bin/bash
# Byte-parity goldens for util batch 10: convertkb, extractdomains,
# pairaln, fwbw, alignbykmer, sequence2profile probes. Outputs into
# tests/golden/util10/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/util10
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

cpdb() { for s in "" .index .dbtype; do cp "$1$s" "$2$s" 2>/dev/null || true; done; }

# --- convertkb (tiny SwissProt-style flat file)
cat > "$TMP/test.dat" <<'EOF'
ID   AAA_HUMAN               Reviewed;          32 AA.
AC   P11111; Q99999;
DT   01-JAN-1990, integrated into UniProtKB/Swiss-Prot.
DT   01-JAN-1991, sequence version 2.
DE   RecName: Full=Alpha protein;
GN   Name=AAA;
OS   Homo sapiens (Human).
OC   Eukaryota; Metazoa; Chordata.
OX   NCBI_TaxID=9606;
RN   [1]
RP   NUCLEOTIDE SEQUENCE.
RA   Doe J.;
RT   "Title one.";
RL   J. Mol. Biol. 1:1-1(1990).
CC   -!- FUNCTION: Test protein.
DR   Pfam; PF00001; Fam1; 1.
PE   1: Evidence at protein level;
KW   Test; Keyword.
FT   CHAIN           1..32
SQ   SEQUENCE   32 AA;  3300 MW;  0123456789ABCDEF CRC64;
     MKVLAAGITG HEWWKLVNSQ QRTEAIKNSY GA
//
ID   BBB_MOUSE               Reviewed;          32 AA.
AC   Q22222;
DT   01-JAN-1992, integrated into UniProtKB/Swiss-Prot.
DE   RecName: Full=Beta protein;
OS   Mus musculus (Mouse).
OC   Eukaryota; Metazoa.
OX   NCBI_TaxID=10090;
RN   [1]
RP   SEQUENCE.
RL   Nature 2:2-2(1992).
PE   2: Evidence at transcript level;
SQ   SEQUENCE   32 AA;  3300 MW;  FEDCBA9876543210 CRC64;
     MKVLAAGITG HEWWKLVNSQ QRTEAIKNSY GV
//
EOF
cp "$TMP/test.dat" "$OUT/test.dat"
$REF convertkb "$TMP/test.dat" "$TMP/kb" --kb-columns "ID,AC,OS,OX,PE,SEQ" $V
for col in ID AC OS OX PE SEQ; do
  cpdb "$TMP/kb_$col" "$OUT/kb_$col"
done
cp "$TMP/kb.lookup" "$OUT/kb.lookup"

# --- extractdomains (domain annotation + MSA)
$REF createdb $DATA/queries_lin.faa "$TMP/qdb" --shuffle 0 $V
$REF createdb $DATA/proteins.faa "$TMP/tdb" --shuffle 0 $V
$REF prefilter "$TMP/qdb" "$TMP/tdb" "$TMP/pref" -s 4 $T $V
$REF align "$TMP/qdb" "$TMP/tdb" "$TMP/pref" "$TMP/aln" -e 1e-3 -a $T $V
$REF result2msa "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/msa" --msa-format-mode 2 $T $V
cpdb "$TMP/msa" "$OUT/msa"
# domain input = summarizetabs output (Domain::writeResult rows)
cp tests/golden/util6/m8db "$TMP/m8db"
cp tests/golden/util6/m8db.index "$TMP/m8db.index"
cp tests/golden/util6/m8db.dbtype "$TMP/m8db.dbtype"
$REF summarizetabs "$TMP/m8db" tests/golden/util6/lengths.tsv "$TMP/sumtabs" $T $V
$REF extractdomains "$TMP/sumtabs" "$TMP/msa" "$TMP/domains" $T $V \
  && cpdb "$TMP/domains" "$OUT/domains" || echo FAILED > "$OUT/domains.SKIPPED"

# --- fwbw (forward-backward alignment over a result DB)
$REF fwbw "$TMP/qdb" "$TMP/tdb" "$TMP/pref" "$TMP/fwbwout" $T $V \
  && cpdb "$TMP/fwbwout" "$OUT/fwbwout" || echo FAILED > "$OUT/fwbw.SKIPPED"

# --- alignbykmer
$REF alignbykmer "$TMP/qdb" "$TMP/tdb" "$TMP/pref" "$TMP/abk" $T $V \
  && cpdb "$TMP/abk" "$OUT/abk" || echo FAILED > "$OUT/abk.SKIPPED"

# --- pairaln needs paired set lookups; probe on plain DBs
$REF pairaln "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/paired" "$TMP/patmp" $T $V \
  && cpdb "$TMP/paired" "$OUT/paired" || echo FAILED > "$OUT/pairaln.SKIPPED"

echo "util10 goldens written to $OUT"
