#!/bin/bash
# Byte-parity goldens for util batch 7: expandaln/expand2profile,
# multihitdb/multihitsearch. Outputs into tests/golden/util7/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/util7
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
# B->C: proteins self-search alignment with backtraces
$REF prefilter "$TMP/tdb" "$TMP/tdb" "$TMP/spref" -s 4 $T $V
$REF align "$TMP/tdb" "$TMP/tdb" "$TMP/spref" "$TMP/selfaln" -e 1e-3 -a $T $V
cpdb "$TMP/selfaln" "$OUT/selfaln"

# --- expandaln / expand2profile
$REF expandaln "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/selfaln" "$TMP/expaln" $T $V
cpdb "$TMP/expaln" "$OUT/expaln"
$REF expand2profile "$TMP/qdb" "$TMP/tdb" "$TMP/aln" "$TMP/selfaln" "$TMP/expprof" $T $V
cpdb "$TMP/expprof" "$OUT/expprof"

# --- multihitdb (two nucleotide set files) + multihitsearch
python3 - "$TMP" "$DATA" <<'PYEOF'
import sys
tmp, data = sys.argv[1], sys.argv[2]
entries = []
name = None
seq = []
for line in open(f"{data}/contigs.fna"):
    line = line.rstrip()
    if line.startswith(">"):
        if name: entries.append((name, "".join(seq)))
        name = line; seq = []
    else: seq.append(line)
entries.append((name, "".join(seq)))
for i, (n, s) in enumerate(entries):
    with open(f"{tmp}/set{i}.fna", "w") as f:
        f.write(f"{n}\n{s}\n")
PYEOF
$REF multihitdb "$TMP/set0.fna" "$TMP/set1.fna" "$TMP/mhdb" "$TMP/mhtmp" $T $V
for f in mhdb mhdb_member_to_set mhdb_set_to_member mhdb_set_size \
         mhdb_nucl_contig_to_set mhdb_nucl_set_to_contig mhdb_nucl_orf_to_contig; do
  cpdb "$TMP/$f" "$OUT/$f"
done
cp "$TMP/set0.fna" "$TMP/set1.fna" "$OUT/"
# target must itself be a multihit DB: self-search
$REF multihitsearch "$TMP/mhdb" "$TMP/mhdb" "$TMP/mhres" "$TMP/mhstmp" $T $V
cpdb "$TMP/mhres" "$OUT/mhres"
AGG=$(find "$TMP/mhstmp" -name "aggregate.dbtype" | head -1)
cpdb "${AGG%.dbtype}" "$OUT/mh_aggregate"
RES=$(find "$TMP/mhstmp" -name "result.dbtype" | head -1)
cpdb "${RES%.dbtype}" "$OUT/mh_result"
# combinepvalperset over the same search result
$REF combinepvalperset "$TMP/mhdb" "$TMP/mhdb" "${RES%.dbtype}" "$TMP/mhpval" "$TMP/pvtmp" $T $V 2>/dev/null || true
cpdb "$TMP/mhpval" "$OUT/mhpval"

echo "util7 goldens written to $OUT"
