#!/bin/bash
# Byte-parity goldens for util batch 5: extractalignedregion,
# summarizeheaders, clusthash, mergeresultsbyset, makepaddedseqdb,
# unpackdb, countkmer, recoverlongestorf, filterresult, ungapped/gapped
# prefilter, easy-linsearch, tar2db/db2tar. Outputs into
# tests/golden/util5/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/util5
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

cpdb() { for s in "" .index .dbtype; do cp "$1$s" "$2$s" 2>/dev/null || true; done; }

$REF createdb $DATA/proteins.faa "$TMP/tdb" --shuffle 0 $V
$REF createdb $DATA/queries_lin.faa "$TMP/qdb" --shuffle 0 $V
$REF prefilter "$TMP/qdb" "$TMP/tdb" "$TMP/pref" -s 4 $T $V
$REF align "$TMP/qdb" "$TMP/tdb" "$TMP/pref" "$TMP/aln" -e 1e-3 -a $T $V

# --- extractalignedregion (query + target modes)
$REF extractalignedregion "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/extq" \
    --extract-mode 1 $T $V
cpdb "$TMP/extq" "$OUT/extq"
$REF extractalignedregion "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/extt" \
    --extract-mode 2 $T $V
cpdb "$TMP/extt" "$OUT/extt"

# --- summarizeheaders: header text stored as an aa-typed DB so the
# reference's validator accepts it and the summarizers parse real headers
python3 - "$TMP" <<'PYEOF'
import sys
tmp = sys.argv[1]
headers = [
 b"sp|P11111|AAA_HUMAN Alpha protein OS=Homo sapiens OX=9606 GN=AAA PE=1 SV=2\n",
 b"tr|Q22222|BBB_MOUSE Hypothetical protein OS=Mus musculus OX=10090 PE=4 SV=1\n",
 b"tr|Q33333|CCC_YEAST Beta transporter OS=Saccharomyces cerevisiae OX=4932 GN=CCC PE=2 SV=1\n",
 b"sp|P44444|DDD_ECOLI Putative kinase OS=Escherichia coli OX=562 GN=DDD PE=3 SV=3\n",
 b"UPI0008DB4360 status=active\n",
]
data = b""; index = []
for k, h in enumerate(headers):
    index.append((k, len(data), len(h)+1)); data += h + b"\x00"
open(f"{tmp}/hdrdb", "wb").write(data)
open(f"{tmp}/hdrdb.index", "w").write("".join(f"{k}\t{o}\t{l}\n" for k,o,l in index))
open(f"{tmp}/hdrdb.dbtype", "wb").write(bytes([0,0,0,0]))
payload = b"0\n1\n2\n3\n4\n"
open(f"{tmp}/clu2", "wb").write(payload + b"\x00")
open(f"{tmp}/clu2.index", "w").write(f"0\t0\t{len(payload)+1}\n")
open(f"{tmp}/clu2.dbtype", "wb").write(bytes([6,0,0,0]))
PYEOF
cpdb "$TMP/hdrdb" "$OUT/hdrdb"
cpdb "$TMP/clu2" "$OUT/clu2"
$REF summarizeheaders "$TMP/hdrdb" "$TMP/hdrdb" "$TMP/clu2" "$TMP/sumhdr" $T $V
cpdb "$TMP/sumhdr" "$OUT/sumhdr"
$REF summarizeheaders "$TMP/hdrdb" "$TMP/hdrdb" "$TMP/clu2" "$TMP/sumhdr_mc" \
    --header-type 2 $T $V
cpdb "$TMP/sumhdr_mc" "$OUT/sumhdr_mc"

# --- clusthash (default alph 3, min-seq-id 0.99 over combined DB)
cat $DATA/queries_lin.faa $DATA/proteins.faa > "$TMP/all.faa"
$REF createdb "$TMP/all.faa" "$TMP/alldb" --shuffle 0 $V
$REF clusthash "$TMP/alldb" "$TMP/chash" $T $V
cpdb "$TMP/chash" "$OUT/chash"
$REF clusthash "$TMP/alldb" "$TMP/chash90" --min-seq-id 0.9 $T $V
cpdb "$TMP/chash90" "$OUT/chash90"

# --- mergeresultsbyset (sets of query keys -> concatenated results)
python3 - "$TMP" <<'PYEOF'
import sys
tmp = sys.argv[1]
entries = [(100, b"0\n2\n"), (101, b"1\n")]
data = b""
index = []
for key, payload in entries:
    index.append((key, len(data), len(payload)+1))
    data += payload + b"\x00"
open(f"{tmp}/sets", "wb").write(data)
open(f"{tmp}/sets.index", "w").write("".join(f"{k}\t{o}\t{l}\n" for k,o,l in index))
open(f"{tmp}/sets.dbtype", "wb").write(bytes([5,0,0,0]))
PYEOF
$REF mergeresultsbyset "$TMP/sets" "$TMP/aln" "$TMP/mrbs" $T $V
cpdb "$TMP/mrbs" "$OUT/mrbs"

# --- makepaddedseqdb
$REF makepaddedseqdb "$TMP/tdb" "$TMP/padded" $T $V
for s in "" .index .dbtype _h _h.index _h.dbtype; do
  cp "$TMP/padded$s" "$OUT/padded$s" 2>/dev/null || true
done

# --- unpackdb (key naming)
mkdir -p "$TMP/unpacked"
$REF unpackdb "$TMP/tdb" "$TMP/unpacked" --unpack-name-mode 0 --unpack-suffix ".seq" $T $V
rm -rf "$OUT/unpacked" && mkdir -p "$OUT/unpacked"
cp "$TMP/unpacked"/* "$OUT/unpacked/"

# --- countkmer (k=2 to keep the table small)
$REF countkmer "$TMP/tdb" -k 2 $T > "$OUT/countkmer_k2.tsv"

# --- recoverlongestorf
$REF createdb $DATA/contigs.fna "$TMP/contigs" --shuffle 0 $V
$REF extractorfs "$TMP/contigs" "$TMP/orfs" --min-length 10 $T $V
python3 - "$TMP" <<'PYEOF'
import sys
tmp = sys.argv[1]
# result DB over orf keys: a few non-empty, most empty
keys = [int(l.split("\t")[0]) for l in open(f"{tmp}/orfs.index")]
data = b""
index = []
for i, k in enumerate(sorted(keys)):
    payload = b""  # all empty: every contig is eliminated
    index.append((k, len(data), len(payload)+1))
    data += payload + b"\x00"
open(f"{tmp}/orfres", "wb").write(data)
open(f"{tmp}/orfres.index", "w").write("".join(f"{k}\t{o}\t{l}\n" for k,o,l in index))
open(f"{tmp}/orfres.dbtype", "wb").write(bytes([5,0,0,0]))
PYEOF
$REF recoverlongestorf "$TMP/orfs" "$TMP/orfres" "$TMP/longestorf" $T $V
cp "$TMP/longestorf" "$OUT/longestorf"
cpdb "$TMP/orfres" "$OUT/orfres"
cpdb "$TMP/orfs" "$OUT/orfs"
for s in _h _h.index _h.dbtype; do cp "$TMP/orfs$s" "$OUT/orfs$s"; done

# --- filterresult
$REF filterresult "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/fres" $T $V
cpdb "$TMP/fres" "$OUT/fres"
$REF filterresult "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/fres2" \
    --diff 1 --max-seq-id 0.95 $T $V
cpdb "$TMP/fres2" "$OUT/fres2"

# --- ungappedprefilter / gappedprefilter
$REF ungappedprefilter "$TMP/qdb" "$TMP/tdb" "$TMP/upref" $T $V
cpdb "$TMP/upref" "$OUT/upref"
$REF gappedprefilter "$TMP/qdb" "$TMP/tdb" "$TMP/gpref" $T $V
cpdb "$TMP/gpref" "$OUT/gpref"

# (easy-linsearch omitted: the reference's easysearch.sh linsearch branch
# builds the .linidx with alph-size 21 + masking on this fixture, which
# yields an empty index and an empty m8 — no meaningful parity surface;
# our easy-linsearch composes the byte-parity linsearch workflow with
# convertalis instead.)

# --- tar2db / db2tar
mkdir -p "$TMP/tarsrc"
printf 'hello world\n' > "$TMP/tarsrc/a.txt"
printf 'second entry\nwith two lines\n' > "$TMP/tarsrc/b.txt"
printf 'third\n' > "$TMP/tarsrc/c.dat"
tar --format=gnu -C "$TMP/tarsrc" -cf "$TMP/src.tar" a.txt b.txt c.dat
cp "$TMP/src.tar" "$OUT/src.tar"
$REF tar2db "$TMP/src.tar" "$TMP/tardb" --tar-include '.*' $T $V
for s in "" .index .dbtype .lookup .source; do
  cp "$TMP/tardb$s" "$OUT/tardb$s" 2>/dev/null || true
done
$REF db2tar "$TMP/tardb" "$TMP/out.tar" $T $V 2>/dev/null || true
cp "$TMP/out.tar" "$OUT/out.tar" 2>/dev/null || true

echo "util5 goldens written to $OUT"
