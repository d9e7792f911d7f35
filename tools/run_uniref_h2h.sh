#!/bin/bash
# UniRef50-regime same-input head-to-head (VERDICT r4 item 3): both this
# framework and the reference binary run easy-predict on the IDENTICAL
# contig prefix against the same 3.43G-residue target DB (auto k-mer
# size 7, IndexTable.h:439; 3 memory-budgeted target splits,
# Prefiltering.cpp:1106), timed on the same quiet host, plus the
# per-contig block byte-parity check (tools/uniref_subsample_check.py).
#
# Usage: tools/run_uniref_h2h.sh BIGDB_FAA CONTIGS_FNA OUT_DIR
#            [N_CONTIGS=150] [SPLITS=3]
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
BIG=$1; CONTIGS=$2; OUT=$3
N=${4:-150}; SPLITS=${5:-3}
mkdir -p "$OUT"

# contig prefix (same input both sides)
python - "$CONTIGS" "$OUT/prefix.fna" "$N" <<'PY'
import sys
src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
cnt = 0
with open(src, "rb") as f, open(dst, "wb") as o:
    for line in f:
        if line.startswith(b">"):
            cnt += 1
            if cnt > n:
                break
        o.write(line)
print(f"prefix: {min(cnt, n)} contigs")
PY

echo "== OURS =="
python tools/run_scale.py "$OUT/prefix.fna" "$BIG" \
    "$OUT/ours" --tmp "$OUT/ours_tmp" --split-memory-limit 16G \
    --json "$OUT/ours.json" > "$OUT/ours.log" 2>&1
tail -1 "$OUT/ours.json"

echo "== REFERENCE (createdb) =="
if [ ! -f "$OUT/bigDB.dbtype" ]; then
    { time $REF createdb "$BIG" "$OUT/bigDB" --shuffle 0 -v 0 ; } \
        2> "$OUT/ref_createdb.time"
    tail -2 "$OUT/ref_createdb.time"
fi

echo "== REFERENCE (easy-predict, --split $SPLITS) =="
# pre-build the contig DB unshuffled so numeric keys (headersMap
# columns) line up with ours — easy-predict's internal createdb
# shuffles by default, which permutes keys without changing content
# (verified: 0 per-accession set-diffs on all four outputs either way)
if [ ! -f "$OUT/prefixDB.dbtype" ]; then
    $REF createdb "$OUT/prefix.fna" "$OUT/prefixDB" --shuffle 0 -v 0
fi
rm -rf "$OUT/ref_tmp"
{ time $REF easy-predict "$OUT/prefixDB" "$OUT/bigDB" "$OUT/ref" \
    "$OUT/ref_tmp" --split "$SPLITS" --split-memory-limit 16G \
    --threads 2 -v 1 > "$OUT/ref.log" 2>&1 ; } 2> "$OUT/ref.time"
tail -3 "$OUT/ref.time"

echo "== PARITY (per-contig blocks) =="
python tools/uniref_subsample_check.py "$OUT/ours" "$OUT/ref" "$N"
