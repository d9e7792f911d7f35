"""taxonomy / easy-taxonomy workflow byte parity vs the reference.

Goldens (tests/golden/tax2, tools/make_tax_goldens.sh): reference
`taxonomy` on queries_lin.faa vs the ptax protein DB in the default
approx-2bLCA mode (taxwf + the `first` lcaalign intermediate + the
prefilter intermediate) and in --lca-mode 4 --tax-output-mode 2
(taxth + taxth_aln), reference `easy-taxonomy` outputs (_lca.tsv,
_report, _tophit_report, _tophit_aln), and `summarizealis` over the
shared res DB and the self-search selfres DB.

Reference: src/workflow/Taxonomy.cpp, data/workflow/taxonomy.sh,
workflow/EasyTaxonomy.cpp, data/workflow/easytaxonomy.sh,
src/util/summarizealis.cpp.
"""

import pathlib
import shutil

import pytest

from metaeuk_tpu.search.lcaalign import lcaalign_db  # noqa: F401 (API)
from metaeuk_tpu.tax import mmtax
from metaeuk_tpu.tax.taxworkflow import (easy_taxonomy, summarizealis_db,
                                         taxonomy_workflow)

GOLDEN = pathlib.Path(__file__).parent / "golden"
TAX2 = GOLDEN / "tax2"
UTILS = GOLDEN / "utils"
DATA = pathlib.Path(__file__).parent / "data"


def assert_db_equal(mine, golden):
    for s in ("", ".index", ".dbtype"):
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    """ptax target DB (with our createtaxdb attachments) + query DB."""
    td = tmp_path_factory.mktemp("taxwf")
    from metaeuk_tpu.cli import main
    assert main(["createdb", str(DATA / "proteins.faa"),
                 str(td / "ptax")]) == 0
    mmtax.createtaxdb(str(td / "ptax"), str(td / "tmp"),
                      ncbi_tax_dump=str(TAX2 / "taxdump"),
                      tax_mapping_file=str(TAX2 / "accmap.tsv"))
    assert main(["createdb", str(DATA / "queries_lin.faa"),
                 str(td / "qdb")]) == 0
    return td


def test_taxonomy_default_approx_2blca(dbs, tmp_path):
    out = tmp_path / "taxwf"
    taxonomy_workflow(str(dbs / "qdb"), str(dbs / "ptax"), str(out),
                      str(tmp_path / "wtmp"))
    assert_db_equal(out, TAX2 / "taxwf")
    # intermediates: prefilter + lcaalign `first` DB
    assert_db_equal(tmp_path / "wtmp" / "pref", TAX2 / "taxwf_pref")
    assert_db_equal(tmp_path / "wtmp" / "first", TAX2 / "taxwf_first")


def test_taxonomy_tophit_both_outputs(dbs, tmp_path):
    out = tmp_path / "taxth"
    taxonomy_workflow(str(dbs / "qdb"), str(dbs / "ptax"), str(out),
                      str(tmp_path / "wtmp"), lca_mode=4, tax_output_mode=2)
    assert_db_equal(out, TAX2 / "taxth")
    assert_db_equal(f"{out}_aln", TAX2 / "taxth_aln")


def test_easy_taxonomy_outputs(dbs, tmp_path):
    prefix = str(tmp_path / "easytax")
    easy_taxonomy(str(DATA / "queries_lin.faa"), str(dbs / "ptax"),
                  prefix, str(tmp_path / "etmp"))
    for suffix in ("_lca.tsv", "_report", "_tophit_report", "_tophit_aln"):
        mine = pathlib.Path(f"{prefix}{suffix}").read_bytes()
        golden = (TAX2 / f"easytax{suffix}").read_bytes()
        assert mine == golden, f"easytax{suffix} mismatch"


def test_summarizealis_parity(tmp_path):
    summarizealis_db(str(TAX2 / "res"), str(tmp_path / "sumali"))
    assert_db_equal(tmp_path / "sumali", TAX2 / "sumali")


def test_summarizealis_selfres_parity(tmp_path):
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(UTILS / f"selfres{s}", tmp_path / f"selfres{s}")
    summarizealis_db(str(tmp_path / "selfres"), str(tmp_path / "sumali"))
    assert_db_equal(tmp_path / "sumali", TAX2 / "sumali_self")
