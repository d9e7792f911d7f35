#!/bin/bash
# Byte-parity golden for the prefilter OVERFLOW regime: a fixture whose
# posting gather exceeds maxDbMatches (QueryMatcher.cpp:283-314 chunked
# processing). Runs the reference binary on the deterministic fixture
# from tests/fixture_ovf.py; commits only the small result DB.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/ovf
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
mkdir -p "$OUT"
V="-v 0"

python tests/fixture_ovf.py "$TMP/ovT.faa" "$TMP/ovQ.faa"
$REF createdb "$TMP/ovT.faa" "$TMP/tdb" --shuffle 0 $V
$REF createdb "$TMP/ovQ.faa" "$TMP/qdb" --shuffle 0 $V
$REF prefilter "$TMP/qdb" "$TMP/tdb" "$TMP/res" --threads 1 $V
for s in "" .index .dbtype; do cp "$TMP/res$s" "$OUT/pfres_ovf$s"; done
echo "wrote $OUT/pfres_ovf"
