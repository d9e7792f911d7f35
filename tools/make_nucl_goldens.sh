#!/bin/bash
# Nucleotide-search (blastn path) goldens: reference
# `search --search-type 3` on the contig fixture. --max-seq-len 700
# forces target splitting — unsplit targets make the reference emit
# uninitialized dbOrf columns (splitsequence.cpp:36-41 passthrough +
# offsetalignment.cpp updateOffset on unparseable headers).
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/utils
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

$REF createdb tests/data/contigs.fna "$TMP/cdb" --shuffle 0 -v 0
$REF search "$TMP/cdb" "$TMP/cdb" "$TMP/res" "$TMP/tmp" --search-type 3 \
  --max-seq-len 700 -a --threads 1 -v 0
for s in "" .index .dbtype; do cp "$TMP/res$s" "$OUT/nucl_search_out$s"; done
echo "nucl search goldens written"
