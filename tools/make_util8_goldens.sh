#!/bin/bash
# Byte-parity goldens for util batch 8: pickconsensusrep, clusterupdate,
# nrtotaxmapping, kmerindexdb-as-createlinindex alias surfaces.
# Outputs into tests/golden/util8/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/util8
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

cpdb() { for s in "" .index .dbtype; do cp "$1$s" "$2$s" 2>/dev/null || true; done; }

cat $DATA/queries_lin.faa $DATA/proteins.faa > "$TMP/all.faa"
$REF createdb "$TMP/all.faa" "$TMP/alldb" --shuffle 0 $V

# --- pickconsensusrep over the default cascaded clustering
$REF cluster "$TMP/alldb" "$TMP/clu" "$TMP/ctmp" $T $V
cpdb "$TMP/clu" "$OUT/clu"
$REF pickconsensusrep "$TMP/alldb" "$TMP/clu" "$TMP/consrep" "$TMP/pcrtmp" $V
cpdb "$TMP/consrep" "$OUT/consrep"

# --- clusterupdate: old = first 18 seqs, new = all 24 + a mutated seq
$REF createdb $DATA/queries_lin.faa "$TMP/olddb" --shuffle 0 $V
$REF cluster "$TMP/olddb" "$TMP/oldclu" "$TMP/octmp" $T $V
cpdb "$TMP/oldclu" "$OUT/oldclu"
$REF clusterupdate "$TMP/olddb" "$TMP/alldb" "$TMP/oldclu" \
    "$TMP/newmapdb" "$TMP/newclu" "$TMP/cutmp" $T $V
cpdb "$TMP/newmapdb" "$OUT/newmapdb"
for s in _h _h.index _h.dbtype; do
  cp "$TMP/newmapdb$s" "$OUT/newmapdb$s" 2>/dev/null || true
done
cpdb "$TMP/newclu" "$OUT/newclu"

# --- nrtotaxmapping (NR-style headers + accession2taxid + taxonomy)
cat > "$TMP/nr.faa" <<'EOF'
>WP_000001.1 alpha protein [Homo sapiens]
MKVLAAGITGHEWWKLVNSQQRTEAIKNSYGA
>WP_000002.1 beta protein [Mus musculus]
MKVLAAGITGHEWWKLVNSQQRTEAIKNSYGV
>WP_000003.1 gamma [Unknownia speciesx]
MKVLAAGITGHEWWKLVNSQQRTEAIKNSYGL
EOF
cp "$TMP/nr.faa" "$OUT/nr.faa"
$REF createdb "$TMP/nr.faa" "$TMP/nrdb" --shuffle 0 $V
# merge the multi-accession header case: append \x01-joined second header
python3 - "$TMP" <<'PYEOF'
import sys
tmp = sys.argv[1]
data = open(f"{tmp}/nrdb_h", "rb").read()
parts = data.split(b"\x00")
# entry 0 gets a second accession via \x01
parts[0] = parts[0].rstrip(b"\n") + b"\x01WP_000009.1 alpha-like [Gallus gallus]\n"
out = b"\x00".join(parts)
open(f"{tmp}/nrdb_h", "wb").write(out)
idx = [l.split("\t") for l in open(f"{tmp}/nrdb_h.index")]
delta = len(parts[0]) + 1 - (int(idx[0][2]))
offs = 0
with open(f"{tmp}/nrdb_h.index", "w") as f:
    for k, o, l in idx:
        ln = int(l) + (delta if k == "0" else 0)
        f.write(f"{k}\t{offs}\t{ln}\n")
        offs += ln
PYEOF
cat > "$TMP/acc2taxid.tsv" <<'EOF'
accession	accession.version	taxid	gi
WP_000001	WP_000001.1	9606	1
WP_000002	WP_000002.1	10090	2
WP_000009	WP_000009.1	9031	3
EOF
cp "$TMP/acc2taxid.tsv" "$OUT/acc2taxid.tsv"
# taxonomy attachments from the tax2 toy taxdump will not contain these
# taxids; build a small NCBI-style dump instead
mkdir -p "$TMP/dump"
cat > "$TMP/dump/nodes.dmp" <<'EOF'
1	|	1	|	no rank	|
2759	|	1	|	superkingdom	|
9606	|	2759	|	species	|
10090	|	2759	|	species	|
9031	|	2759	|	species	|
5555	|	2759	|	species	|
EOF
cat > "$TMP/dump/names.dmp" <<'EOF'
1	|	root	|		|	scientific name	|
2759	|	Eukaryota	|		|	scientific name	|
9606	|	Homo sapiens	|		|	scientific name	|
10090	|	Mus musculus	|		|	scientific name	|
9031	|	Gallus gallus	|		|	scientific name	|
5555	|	Unknownia speciesx	|		|	scientific name	|
EOF
touch "$TMP/dump/merged.dmp"
cp -r "$TMP/dump" "$OUT/taxdump8"
$REF createbintaxonomy "$TMP/dump/names.dmp" "$TMP/dump/nodes.dmp" \
    "$TMP/dump/merged.dmp" "$TMP/nrdb_taxonomy" $V
$REF nrtotaxmapping "$TMP/acc2taxid.tsv" "$TMP/nrdb" "$TMP/nrmap" $T $V
cp "$TMP/nrmap" "$OUT/nrmap"
cp "$TMP/nrdb_h" "$OUT/nrdb_h"
cp "$TMP/nrdb_h.index" "$OUT/nrdb_h.index"
cp "$TMP/nrdb_h.dbtype" "$OUT/nrdb_h.dbtype"

echo "util8 goldens written to $OUT"
