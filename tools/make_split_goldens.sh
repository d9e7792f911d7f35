#!/bin/bash
# Byte-parity goldens for target-DB-split prefiltering: the reference
# binary forced to --split N --split-mode 0 (TARGET_DB_SPLIT) on the
# committed pfQ/pfT fixture; our SplitKmerPrefilter must merge to the
# same bytes.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/pref
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
V="-v 0"

$REF prefilter "$OUT/pfQ" "$OUT/pfT" "$TMP/res3" --split 3 --split-mode 0 --threads 1 $V
for s in "" .index .dbtype; do cp "$TMP/res3$s" "$OUT/pfres_split3$s"; done
$REF prefilter "$OUT/pfT" "$OUT/pfT" "$TMP/res2" --split 2 --split-mode 0 --threads 1 $V
for s in "" .index .dbtype; do cp "$TMP/res2$s" "$OUT/pfres_split2_self$s"; done
echo wrote "$OUT/pfres_split3" "$OUT/pfres_split2_self"
