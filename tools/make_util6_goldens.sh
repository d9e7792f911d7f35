#!/bin/bash
# Byte-parity goldens for util batch 6: profile2consensus/profile2repseq/
# profile2neff, convertmsa, filtera3m, alignall, summarizetabs,
# extractdomains, result2dnamsa. Outputs into tests/golden/util6/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/util6
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

cpdb() { for s in "" .index .dbtype; do cp "$1$s" "$2$s" 2>/dev/null || true; done; }

$REF createdb $DATA/queries_lin.faa "$TMP/qdb" --shuffle 0 $V
$REF createdb $DATA/proteins.faa "$TMP/tdb" --shuffle 0 $V
$REF prefilter "$TMP/qdb" "$TMP/tdb" "$TMP/pref" -s 4 $T $V
$REF align "$TMP/qdb" "$TMP/tdb" "$TMP/pref" "$TMP/aln" -e 1e-3 -a $T $V

# --- profile DB + profile2consensus / profile2repseq / profile2neff
$REF result2profile "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/prof" $T $V
$REF profile2consensus "$TMP/prof" "$TMP/p2c" $T $V
cpdb "$TMP/p2c" "$OUT/p2c"
$REF profile2repseq "$TMP/prof" "$TMP/p2r" $T $V
cpdb "$TMP/p2r" "$OUT/p2r"
$REF profile2neff "$TMP/prof" "$OUT/p2n.txt"

# --- convertmsa (Stockholm with two entries, multi-block + annotations)
cat > "$TMP/test.sto" <<'EOF'
# STOCKHOLM 1.0
#=GF ID   FAM1
#=GF AC   PF00001.1
seq1/1-24   MKVLAAGITG.HEWWKLVNSQ
seq2/5-28   MKVLAA-ITGGHEWWKLVNSQ
#=GC seq_cons  MKVLAAGITGxHEWWKLVNSQ
seq1/1-24   QRTE
seq2/5-28   QRTE
//
# STOCKHOLM 1.0
#=GF ID   FAM2
seqA   GITGHEWWKL
seqB   GITG.EWWKL
//
EOF
cp "$TMP/test.sto" "$OUT/test.sto"
$REF convertmsa "$TMP/test.sto" "$TMP/msadb" $V
cpdb "$TMP/msadb" "$OUT/msadb"
$REF convertmsa "$TMP/test.sto" "$TMP/msadb_ac" --identifier-field 1 $V
cpdb "$TMP/msadb_ac" "$OUT/msadb_ac"

# --- filtera3m
cat > "$TMP/test.a3m" <<'EOF'
>center
MKVLAAGITGHEWWKLVNSQQRTEAIKNSYGA
>m1
MKVLAAGITGHEWWKLVNSQQRTEAIKNSYGA
>m2
MKVLAAGITGHEWWKLVNSQQRTEAIKNSYGV
>m3
MKVLAAGITGaeHEWWKLVNSQ-RTEAIKNSYGL
>m4
MAVLAAGITGHEWWKLVNSQQRTEAIKNSYGI
EOF
cp "$TMP/test.a3m" "$OUT/test.a3m"
$REF filtera3m "$TMP/test.a3m" "$OUT/filtered.a3m" --max-seq-id 0.99 $V
$REF filtera3m "$TMP/test.a3m" "$OUT/filtered_diff1.a3m" --diff 1 --max-seq-id 0.95 $V

# --- alignall over a set DB (keys of tdb + qdb members)
python3 - "$TMP" <<'PYEOF'
import sys
tmp = sys.argv[1]
entries = [(0, b"0\n1\n2\n18\n"), (1, b"3\n4\n5\n19\n")]
data = b""; index = []
for k, p in entries:
    index.append((k, len(data), len(p)+1)); data += p + b"\x00"
open(f"{tmp}/sets", "wb").write(data)
open(f"{tmp}/sets.index", "w").write("".join(f"{k}\t{o}\t{l}\n" for k,o,l in index))
open(f"{tmp}/sets.dbtype", "wb").write(bytes([6,0,0,0]))
PYEOF
cat $DATA/queries_lin.faa $DATA/proteins.faa > "$TMP/all.faa"
$REF createdb "$TMP/all.faa" "$TMP/alldb" --shuffle 0 $V
$REF alignall "$TMP/alldb" "$TMP/sets" "$TMP/allaln" -e 1e-3 $T $V
cpdb "$TMP/allaln" "$OUT/allaln"
cpdb "$TMP/sets" "$OUT/sets"

# --- summarizetabs / extractdomains (m8 DB + length TSV)
$REF convertalis "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/alis.m8" $T $V
python3 - "$TMP" <<'PYEOF'
import sys
tmp = sys.argv[1]
# m8 lines grouped per query key into a DB; length file over accessions
lines = {}
for ln in open(f"{tmp}/alis.m8"):
    q = ln.split("\t")[0]
    lines.setdefault(q, []).append(ln)
qmap = {}
for l in open(f"{tmp}/qdb.lookup"):
    c = l.rstrip("\n").split("\t")
    qmap[c[1]] = int(c[0])
data = b""; index = []
for q in sorted(lines, key=lambda x: qmap[x]):
    payload = "".join(lines[q]).encode()
    index.append((qmap[q], len(data), len(payload)+1))
    data += payload + b"\x00"
open(f"{tmp}/m8db", "wb").write(data)
open(f"{tmp}/m8db.index", "w").write("".join(f"{k}\t{o}\t{l}\n" for k,o,l in index))
open(f"{tmp}/m8db.dbtype", "wb").write(bytes([5,0,0,0]))
# length file: accession \t length for queries (by KEY string) + targets
out = []
for l in open(f"{tmp}/qdb.index"):
    c = l.split("\t"); out.append(f"{c[0]}\t{int(c[2])-2}\n")
for l in open(f"{tmp}/tdb.lookup"):
    c = l.rstrip("\n").split("\t")
    pass
import re
for l in open(f"{tmp}/tdb.index"):
    c = l.split("\t")
open(f"{tmp}/lengths.tsv", "w").write("".join(out))
PYEOF
# target lengths by accession
python3 - "$TMP" <<'PYEOF'
import sys
tmp = sys.argv[1]
idx = {int(l.split("\t")[0]): int(l.split("\t")[2])-2 for l in open(f"{tmp}/tdb.index")}
lk = {int(l.split("\t")[0]): l.split("\t")[1] for l in open(f"{tmp}/tdb.lookup")}
with open(f"{tmp}/lengths.tsv", "a") as f:
    for k, name in lk.items():
        f.write(f"{name}\t{idx[k]}\n")
PYEOF
cp "$TMP/lengths.tsv" "$OUT/lengths.tsv"
cpdb "$TMP/m8db" "$OUT/m8db"
$REF summarizetabs "$TMP/m8db" "$TMP/lengths.tsv" "$TMP/sumtabs" $T $V
cpdb "$TMP/sumtabs" "$OUT/sumtabs"

# --- result2dnamsa (nucleotide self-search alignment)
$REF createdb $DATA/contigs.fna "$TMP/ndb" --shuffle 0 $V
$REF search "$TMP/ndb" "$TMP/ndb" "$TMP/nres" "$TMP/nstmp" --search-type 3 -a $T $V
cpdb "$TMP/nres" "$OUT/nres"
$REF result2dnamsa "$TMP/ndb" "$TMP/ndb" "$TMP/nres" "$TMP/dnamsa" $T $V
cpdb "$TMP/dnamsa" "$OUT/dnamsa"

echo "util6 goldens written to $OUT"
