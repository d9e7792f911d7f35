#!/bin/bash
# Goldens for convertca3m. The reference DISABLES ca3m generation in
# result2msa (result2msa.cpp:41-44), so the ca3m input fixture is
# crafted here in the HH-suite compressed-A3M block format
# (CompressedA3M::hitToBuffer) from a reference alignment DB; the
# golden is the reference convertca3m run over it. Outputs into
# tests/golden/ca3m/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/ca3m
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"
T="--threads 1"

$REF createdb $DATA/queries_lin.faa "$TMP/qdb" --shuffle 0 $V
$REF createdb $DATA/proteins.faa "$TMP/tdb" --shuffle 0 $V
$REF prefilter "$TMP/qdb" "$TMP/tdb" "$TMP/pref" -s 4 $T $V
$REF align "$TMP/qdb" "$TMP/tdb" "$TMP/pref" "$TMP/aln" -e 1e-3 -a $T $V

python3 - "$TMP" <<'PYEOF'
import re
import struct
import sys

tmp = sys.argv[1]


def read_db(base):
    idx = [ln.split("\t") for ln in open(base + ".index")]
    data = open(base, "rb").read()
    return [(int(k), data[int(o):int(o) + int(l) - 1]) for k, o, l in idx]


def expand(cigar):
    return "".join(int(n) * c for n, c in re.findall(r"(\d+)([MID])", cigar))


def block(target_id, q_start, db_start, bt):
    out = bytearray(struct.pack("<IH", target_id, db_start + 1))
    blocks = bytearray()
    nb = 0
    gap = q_start
    while gap:
        g = min(127, gap)
        blocks += bytes([0, (-g) & 0xFF])
        gap -= g
        nb += 1
    i = 0
    while i < len(bt):
        ml = 0
        while i < len(bt) and bt[i] == "M" and ml < 255:
            i += 1
            ml += 1
        ch = bt[i] if i < len(bt) and bt[i] != "M" else None
        il = 0
        while ch and i < len(bt) and bt[i] == ch and il < 127:
            i += 1
            il += 1
        val = il if ch == "D" else ((-il) & 0xFF if ch == "I" else 0)
        blocks += bytes([ml, val & 0xFF])
        nb += 1
    out += struct.pack("<H", nb)
    out += blocks
    return bytes(out)


qseqs = read_db(f"{tmp}/qdb")
tseqs = read_db(f"{tmp}/tdb")
qhdrs = dict(read_db(f"{tmp}/qdb_h"))
aln = read_db(f"{tmp}/aln")

# _sequence: queries (new keys 0..nq-1) then targets (nq..)
nq = len(qseqs)
entries = [(i, p) for i, (k, p) in enumerate(qseqs)] + \
          [(nq + i, p) for i, (k, p) in enumerate(tseqs)]
with open(f"{tmp}/ca3mdb_sequence.ffdata", "wb") as f, \
        open(f"{tmp}/ca3mdb_sequence.ffindex", "w") as fi:
    off = 0
    for k, p in entries:
        blob = p + b"\x00"
        f.write(blob)
        fi.write(f"{k}\t{off}\t{len(blob)}\n")
        off += len(blob)
open(f"{tmp}/ca3mdb_sequence.ffdata.dbtype", "wb").write(
    struct.pack("<I", 0))

qkey_to_new = {k: i for i, (k, p) in enumerate(qseqs)}
tkey_to_new = {k: nq + i for i, (k, p) in enumerate(tseqs)}
qseq_map = dict(qseqs)

with open(f"{tmp}/ca3mdb_ca3m.ffdata", "wb") as f, \
        open(f"{tmp}/ca3mdb_ca3m.ffindex", "w") as fi:
    off = 0
    for qkey, payload in aln:
        lines = [l for l in payload.decode().split("\n") if l]
        if not lines:
            continue
        hdr = qhdrs[qkey].decode().rstrip("\n")
        seq = qseq_map[qkey].decode().rstrip("\n")
        body = bytearray(f">{hdr}\n{seq}\n;".encode())
        body += block(qkey_to_new[qkey], 0, 0, "M" * len(seq))
        for ln in lines:
            c = ln.split("\t")
            tkey, qs, ds, bt = int(c[0]), int(c[4]), int(c[7]), c[10]
            body += block(tkey_to_new[tkey], qs, ds, expand(bt))
        blob = bytes(body) + b"\x00"
        f.write(blob)
        fi.write(f"{qkey}\t{off}\t{len(blob)}\n")
        off += len(blob)
open(f"{tmp}/ca3mdb_ca3m.ffdata.dbtype", "wb").write(
    struct.pack("<I", 10))
# stub base triple so the DbValidator accepts the input
open(f"{tmp}/ca3mdb", "wb").close()
open(f"{tmp}/ca3mdb.index", "w").write("0\t0\t0\n")
open(f"{tmp}/ca3mdb.dbtype", "wb").write(struct.pack("<I", 10))
print("crafted ca3m fixture")
PYEOF

cp "$TMP"/ca3mdb_ca3m.ffdata "$TMP"/ca3mdb_ca3m.ffindex \
   "$TMP"/ca3mdb_sequence.ffdata "$TMP"/ca3mdb_sequence.ffindex \
   "$TMP"/ca3mdb "$TMP"/ca3mdb.index "$TMP"/ca3mdb.dbtype \
   "$OUT/"
for s in "" .index .dbtype; do cp "$TMP/aln$s" "$OUT/aln$s"; done

$REF convertca3m "$TMP/ca3mdb" "$TMP/convout" $T $V
for s in "" .index .dbtype; do cp "$TMP/convout$s" "$OUT/convout$s"; done

echo "ca3m goldens written to $OUT"
