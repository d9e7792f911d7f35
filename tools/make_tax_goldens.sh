#!/bin/bash
# Goldens for the mmseqs-level taxonomy commands (lca, majoritylca,
# aggregatetax(weights), addtaxonomy, filtertaxdb, filtertaxseqdb,
# taxonomyreport, createbintaxonomy/createbintaxmapping/createdmptaxonomy,
# createtaxdb) from the reference binary at .refbuild/src/metaeuk.
# Outputs into tests/golden/tax2/.
set -euo pipefail
cd "$(dirname "$0")/.."
REF=.refbuild/src/metaeuk
OUT=tests/golden/tax2
DATA=tests/data
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
rm -rf "$OUT"
mkdir -p "$OUT/taxdump"
V="-v 0"
T="--threads 1"

# --- toy NCBI taxdump: two superkingdoms, full rank chains, a no-rank
# strain, merged ids, names with XML-special characters
cat > "$OUT/taxdump/nodes.dmp" <<'EOF'
1	|	1	|	no rank	|		|
1356	|	1	|	no rank	|		|
2	|	1356	|	superkingdom	|		|
2759	|	1356	|	superkingdom	|		|
12908	|	1	|	no rank	|		|
28384	|	1	|	no rank	|		|
4890	|	2759	|	phylum	|		|
1475	|	4890	|	class	|		|
5125	|	1475	|	order	|		|
5129	|	5125	|	family	|		|
5543	|	5129	|	genus	|		|
5145	|	5543	|	species	|		|
5432	|	5145	|	no rank	|		|
2987	|	5543	|	species	|		|
1224	|	2	|	phylum	|		|
1236	|	1224	|	class	|		|
9134	|	1236	|	order	|		|
543	|	9134	|	family	|		|
561	|	543	|	genus	|		|
562	|	561	|	species	|		|
EOF
cat > "$OUT/taxdump/names.dmp" <<'EOF'
1	|	root	|		|	scientific name	|
1356	|	cellular organisms	|		|	scientific name	|
2	|	Bacteria	|		|	scientific name	|
2	|	eubacteria	|		|	synonym	|
2759	|	Eukaryota	|		|	scientific name	|
12908	|	unclassified sequences	|		|	scientific name	|
28384	|	other sequences	|		|	scientific name	|
4890	|	Ascomycota	|		|	scientific name	|
1475	|	Sordariomycetes	|		|	scientific name	|
5125	|	Hypocreales	|		|	scientific name	|
5129	|	Hypocreaceae <"quoted" & 'odd>	|		|	scientific name	|
5543	|	Trichoderma	|		|	scientific name	|
5145	|	Trichoderma harzianum	|		|	scientific name	|
5432	|	Trichoderma harzianum CBS 226.95	|		|	scientific name	|
2987	|	Trichoderma viride	|		|	scientific name	|
1224	|	Proteobacteria	|		|	scientific name	|
1236	|	Gammaproteobacteria	|		|	scientific name	|
9134	|	Enterobacterales	|		|	scientific name	|
543	|	Enterobacteriaceae	|		|	scientific name	|
561	|	Escherichia	|		|	scientific name	|
562	|	Escherichia coli	|		|	scientific name	|
562	|	E. coli	|		|	synonym	|
EOF
cat > "$OUT/taxdump/merged.dmp" <<'EOF'
666	|	562	|
999	|	5145	|
EOF
printf '7777\t|\n' > "$OUT/taxdump/delnodes.dmp"

# accession -> taxid mapping (key 1 = merged id on purpose)
cat > "$OUT/accmap.tsv" <<'EOF'
P1	5145
P2	999
P3	5432
P4	562
D1	12908
EOF

# --- createbintaxonomy determinism check + golden
$REF createbintaxonomy "$OUT/taxdump/names.dmp" "$OUT/taxdump/nodes.dmp" \
    "$OUT/taxdump/merged.dmp" "$TMP/tax1.bin" $V
$REF createbintaxonomy "$OUT/taxdump/names.dmp" "$OUT/taxdump/nodes.dmp" \
    "$OUT/taxdump/merged.dmp" "$TMP/tax2.bin" $V
if cmp -s "$TMP/tax1.bin" "$TMP/tax2.bin"; then
  echo "createbintaxonomy deterministic"
else
  echo "WARNING: createbintaxonomy NON-deterministic (struct padding)"
fi
cp "$TMP/tax1.bin" "$OUT/taxonomy.bin"

# --- protein seq DB with attached taxonomy (createtaxdb golden)
$REF createdb $DATA/proteins.faa "$TMP/ptax" --shuffle 0 $V
$REF createtaxdb "$TMP/ptax" "$TMP/taxtmp" --ncbi-tax-dump "$OUT/taxdump" \
    --tax-mapping-file "$OUT/accmap.tsv" $T $V
cp "$TMP/ptax_mapping" "$OUT/ptax_mapping"
cp "$TMP/ptax_taxonomy" "$OUT/ptax_taxonomy"

# --- binary mapping golden
$REF createbintaxmapping "$TMP/ptax_mapping" "$OUT/mapping.bin" $V

# --- createdmptaxonomy (binary -> dmp round trip)
$REF createdmptaxonomy "$TMP/ptax" "$OUT/dmpout" $V

# --- alignment-format result DB keyed by query (targets = protein keys)
cat > "$TMP/res.tsv" <<'EOF'
10	0	339	1.00	1.000E-50	0	149	150	0	149	150
10	1	330	0.98	2.000E-50	0	149	150	0	149	150
10	2	310	0.95	1.000E-45	0	119	120	0	119	120
10	3	80	0.35	1.000E-10	0	89	90	0	89	90
10	4	500	1.00	1.000E-60	0	129	130	0	129	130
10	5	600	1.00	1.000E-70	0	69	70	0	69	70
11	3	400	1.00	1.000E-80	0	89	90	0	89	90
11	0	60	0.30	1.000E-09	0	149	150	0	149	150
13	5	600	1.00	1.000E-70	0	69	70	0	69	70
13	4	500	1.00	1.000E-60	0	129	130	0	129	130
EOF
$REF tsv2db "$TMP/res.tsv" "$TMP/res" --output-dbtype 5 $V
for s in "" .index .dbtype; do cp "$TMP/res$s" "$OUT/res$s"; done

# --- lca variants
run_lca() { # name extra-args...
  local name=$1; shift
  $REF lca "$TMP/ptax" "$TMP/res" "$TMP/$name" $T $V "$@"
  for s in "" .index .dbtype; do cp "$TMP/$name$s" "$OUT/$name$s"; done
}
run_lca lca_default
run_lca lca_ranks --lca-ranks "species,genus,family,superkingdom"
run_lca lca_lin1 --tax-lineage 1
run_lca lca_lin2 --tax-lineage 2
run_lca lca_nobl --blacklist ""
run_lca lca_blname --blacklist "12908:wrong name,28384:other sequences"

# --- majoritylca variants
run_maj() {
  local name=$1; shift
  $REF majoritylca "$TMP/ptax" "$TMP/res" "$TMP/$name" $T $V "$@"
  for s in "" .index .dbtype; do cp "$TMP/$name$s" "$OUT/$name$s"; done
}
run_maj maj_v1
run_maj maj_v0 --vote-mode 0
run_maj maj_v2 --vote-mode 2
run_maj maj_thr --majority 0.9

# --- aggregatetax / aggregatetaxweights
cat > "$TMP/sets.tsv" <<'EOF'
100	10
100	11
101	13
EOF
$REF tsv2db "$TMP/sets.tsv" "$TMP/sets" --output-dbtype 12 $V
$REF aggregatetax "$TMP/ptax" "$TMP/sets" "$TMP/lca_default" \
    "$TMP/aggtax" $T $V --lca-ranks "genus,superkingdom"
for s in "" .index .dbtype; do cp "$TMP/aggtax$s" "$OUT/aggtax$s"; done
$REF aggregatetaxweights "$TMP/ptax" "$TMP/sets" "$TMP/lca_default" \
    "$TMP/res" "$TMP/aggw" $T $V
for s in "" .index .dbtype; do cp "$TMP/aggw$s" "$OUT/aggw$s"; done

# --- addtaxonomy (target keys; query keys on the self-result DB)
$REF addtaxonomy "$TMP/ptax" "$TMP/res" "$TMP/addtax" $T $V
for s in "" .index .dbtype; do cp "$TMP/addtax$s" "$OUT/addtax$s"; done
$REF addtaxonomy "$TMP/ptax" "$TMP/res" "$TMP/addtax_ranks" $T $V \
    --lca-ranks "species,phylum" --tax-lineage 1
for s in "" .index .dbtype; do
  cp "$TMP/addtax_ranks$s" "$OUT/addtax_ranks$s"
done
for s in "" .index .dbtype; do
  cp "tests/golden/utils/selfres$s" "$TMP/selfres$s"
done
$REF addtaxonomy "$TMP/ptax" "$TMP/selfres" "$TMP/addtax_q" $T $V \
    --pick-id-from 1
for s in "" .index .dbtype; do cp "$TMP/addtax_q$s" "$OUT/addtax_q$s"; done

# --- filtertaxdb on the lca output (first column = taxid)
run_ftd() {
  local name=$1; shift
  $REF filtertaxdb "$TMP/ptax" "$TMP/lca_default" "$TMP/$name" $T $V "$@"
  for s in "" .index .dbtype; do cp "$TMP/$name$s" "$OUT/$name$s"; done
}
run_ftd ftd_num --taxon-list 2759
run_ftd ftd_expr --taxon-list "2||562"
run_ftd ftd_not --taxon-list "!2759"
run_ftd ftd_comma --taxon-list "562,5145"

# --- filtertaxseqdb
$REF filtertaxseqdb "$TMP/ptax" "$TMP/ftsq_hard" --taxon-list 2759 $T $V
for s in "" .index .dbtype; do cp "$TMP/ftsq_hard$s" "$OUT/ftsq_hard$s"; done
$REF filtertaxseqdb "$TMP/ptax" "$TMP/ftsq_soft" --taxon-list 2759 \
    --subdb-mode 1 $T $V
cp "$TMP/ftsq_soft.index" "$OUT/ftsq_soft.index"

# --- taxonomyreport
$REF taxonomyreport "$TMP/ptax" "$TMP/lca_default" "$OUT/report_kraken" $T $V
$REF taxonomyreport "$TMP/ptax" "$TMP/res" "$OUT/report_kraken_aln" $T $V
$REF taxonomyreport "$TMP/ptax" "$TMP/ptax" "$OUT/report_kraken_seq" $T $V
$REF taxonomyreport "$TMP/ptax" "$TMP/lca_default" "$OUT/report_krona" \
    --report-mode 1 $T $V

# --- interop: the reference must load OUR createtaxdb outputs and
# reproduce the lca goldens byte-for-byte
python - <<'PYEOF'
from metaeuk_tpu.tax import mmtax
import os, shutil
os.system("python -m metaeuk_tpu.cli createdb tests/data/proteins.faa "
          "/tmp/interop_ptax > /dev/null")
mmtax.createtaxdb("/tmp/interop_ptax", "/tmp/interop_tmp",
                  ncbi_tax_dump="tests/golden/tax2/taxdump",
                  tax_mapping_file="tests/golden/tax2/accmap.tsv")
for s in ("", ".index", ".dbtype"):
    shutil.copyfile(f"tests/golden/tax2/res{s}", f"/tmp/interop_res{s}")
PYEOF
$REF lca /tmp/interop_ptax /tmp/interop_res "$TMP/interop_out" $T $V
cmp "$TMP/interop_out" "$OUT/lca_default" && echo "interop OK"
rm -f /tmp/interop_ptax* /tmp/interop_res*
rm -rf /tmp/interop_tmp

echo "tax goldens written to $OUT"

# --- taxonomy / easy-taxonomy workflows + lcaalign + summarizealis
$REF createdb $DATA/queries_lin.faa "$TMP/qdb" --shuffle 0 $V
$REF taxonomy "$TMP/qdb" "$TMP/ptax" "$TMP/taxwf" "$TMP/taxwf_tmp" $T $V
for s in "" .index .dbtype; do cp "$TMP/taxwf$s" "$OUT/taxwf$s"; done
FIRST=$(find "$TMP/taxwf_tmp" -name "first" | head -1)
for s in "" .index .dbtype; do cp "$FIRST$s" "$OUT/taxwf_first$s"; done
PREF=$(find "$TMP/taxwf_tmp" -path "*tmp_hsp1*" -name "pref*" ! -name "*.index" ! -name "*.dbtype" | head -1)
if [ -n "$PREF" ]; then
  for s in "" .index .dbtype; do cp "$PREF$s" "$OUT/taxwf_pref$s" 2>/dev/null || true; done
fi
$REF taxonomy "$TMP/qdb" "$TMP/ptax" "$TMP/taxth" "$TMP/taxth_tmp" $T $V \
    --lca-mode 4 --tax-output-mode 2
for s in "" .index .dbtype; do
  cp "$TMP/taxth$s" "$OUT/taxth$s"
  cp "$TMP/taxth_aln$s" "$OUT/taxth_aln$s"
done
$REF easy-taxonomy $DATA/queries_lin.faa "$TMP/ptax" "$TMP/easytax" \
    "$TMP/easytax_tmp" $T $V
for f in _lca.tsv _report _tophit_report _tophit_aln; do
  cp "$TMP/easytax$f" "$OUT/easytax$f"
done
$REF summarizealis "$TMP/res" "$TMP/sumali" $T $V
for s in "" .index .dbtype; do cp "$TMP/sumali$s" "$OUT/sumali$s"; done
for s in "" .index .dbtype; do
  cp "tests/golden/utils/selfres$s" "$TMP/selfres$s"
done
$REF summarizealis "$TMP/selfres" "$TMP/sumali_self" $T $V
for s in "" .index .dbtype; do
  cp "$TMP/sumali_self$s" "$OUT/sumali_self$s"
done
