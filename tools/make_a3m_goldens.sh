#!/bin/bash
# Byte-parity goldens for the PDB70 (A3M) and CDD (FASTA_MSA) databases
# chains (databases.sh:321-357).  Requires the reference build
# (.refbuild/src/metaeuk).  The PDB70 awk repack is executed FROM the
# reference's own databases.sh (the line is eval'd with TMP_PATH set) so
# the golden covers the exact awk semantics our
# pipeline/databases.py::_pdb70_tar_to_msadb replicates.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
REFSH=/root/reference/lib/mmseqs/data/workflow/databases.sh
OUT=tests/golden/databases
DATA=tests/data
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

python tools/make_msachain_fixtures.py "$DATA"

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

cpdb() { for s in "" .index .dbtype; do cp "$1$s" "$2$s"; done;
         for s in _h _h.index _h.dbtype; do
             [ -f "$1$s" ] && cp "$1$s" "$2$s" || true; done; }

# ---- PDB70 chain: awk repack (from the reference's databases.sh) ----
TMP_PATH="$TMP"
cp "$DATA/pdb70_fixture.tar.gz" "$TMP_PATH/pdb70.tar.gz"
AWK_LINE=$(grep 'pdb70_a3m.ffdata' "$REFSH")
eval "$AWK_LINE"
# this image ships mawk, which drops the awk program's "\0" entry
# terminators (gawk emits them; the .index sizes are length(data)+1
# under BOTH).  Reconstruct the gawk-semantics data file from the
# index: re-slice at the cumulative size-1 boundaries and re-insert
# the NULs (entry text itself is NUL-free — tr -d '\000' upstream).
python - "$TMP_PATH/msa" <<'PY'
import sys
msa = sys.argv[1]
data = open(msa, "rb").read()
if b"\x00" not in data:
    out, pos = [], 0
    for line in open(msa + ".index"):
        _k, _off, size = line.split("\t")
        n = int(size) - 1
        out.append(data[pos:pos + n] + b"\x00")
        pos += n
    open(msa, "wb").write(b"".join(out))
PY
# msa DB golden (the _pdb70_tar_to_msadb parity target)
cpdb "$TMP_PATH/msa" "$OUT/pdb70_msa"
cp "$TMP_PATH/msa.index" "$OUT/pdb70_msa.index"
$REF msa2profile "$TMP_PATH/msa" "$TMP_PATH/pdb70_prof" \
    --match-mode 1 --match-ratio 0.5 --msa-type 1 $V $T
cpdb "$TMP_PATH/pdb70_prof" "$OUT/pdb70_prof"

# ---- CDD chain: tar2db + lookup fix + msa2profile --skip-query ----
$REF tar2db "$DATA/cdd_fixture.tar.gz" "$TMP_PATH/cddmsa" \
    --output-dbtype 11 $V $T
sed 's|\.FASTA||g' "$TMP_PATH/cddmsa.lookup" > "$TMP_PATH/cddmsa.lookup_tmp"
mv -f "$TMP_PATH/cddmsa.lookup_tmp" "$TMP_PATH/cddmsa.lookup"
cp "$TMP_PATH/cddmsa.lookup" "$OUT/cdd_msa.lookup"
$REF msa2profile "$TMP_PATH/cddmsa" "$TMP_PATH/cdd_prof" \
    --match-mode 1 --match-ratio 0.5 --skip-query $V $T
cpdb "$TMP_PATH/cdd_prof" "$OUT/cdd_prof"

echo "goldens written to $OUT"
