"""Taxonomy-module byte parity vs the reference binary.

Goldens (tests/golden/tax2, tools/make_tax_goldens.sh): a toy NCBI
taxdump (two superkingdoms, merged ids, XML-special names, default
blacklist nodes) and reference outputs for createtaxdb,
createbintaxonomy/createbintaxmapping/createdmptaxonomy, lca,
majoritylca, aggregatetax(weights), addtaxonomy, filtertaxdb,
filtertaxseqdb and taxonomyreport.

The binary ``_taxonomy`` file contains 4 uninitialized padding bytes per
TaxonNode in the reference (verified non-deterministic across runs), so
binary comparisons mask bytes 12..16 of each 32-byte node record; our
serializer writes zeros there.
"""

import pathlib
import shutil
import struct

import pytest

from metaeuk_tpu.tax import mmtax

GOLDEN = pathlib.Path(__file__).parent / "golden"
TAX2 = GOLDEN / "tax2"
DATA = pathlib.Path(__file__).parent / "data"


def mask_node_padding(blob):
    """Zero the 4 padding bytes of each serialized TaxonNode."""
    n_nodes = struct.unpack_from("<Q", blob, 4)[0]
    b = bytearray(blob)
    base = 16
    for i in range(n_nodes):
        off = base + i * 32 + 12
        b[off:off + 4] = b"\x00" * 4
    return bytes(b)


def db_files(path):
    return [(s, pathlib.Path(f"{path}{s}").read_bytes())
            for s in ("", ".index", ".dbtype")]


def assert_db_equal(mine, golden):
    for (s, a), (_s2, b) in zip(db_files(mine), db_files(golden)):
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def ptax(tmp_path_factory):
    """Our protein seq DB with our createtaxdb attachments + the shared
    result/set DB copies."""
    td = tmp_path_factory.mktemp("mmtax")
    from metaeuk_tpu.cli import main
    assert main(["createdb", str(DATA / "proteins.faa"),
                 str(td / "ptax")]) == 0
    mmtax.createtaxdb(str(td / "ptax"), str(td / "tmp"),
                      ncbi_tax_dump=str(TAX2 / "taxdump"),
                      tax_mapping_file=str(TAX2 / "accmap.tsv"))
    for name in ("res", "sets", "lca_default"):
        for s in ("", ".index", ".dbtype"):
            p = TAX2 / f"{name}{s}"
            if p.exists():
                shutil.copyfile(p, td / f"{name}{s}")
    # the sets DB for aggregatetax comes from the goldens script inputs
    if not (td / "sets.dbtype").exists():
        from metaeuk_tpu.io import mmseqsdb
        mmseqsdb.write_db(str(td / "sets"),
                          [(100, b"10\n11\n"), (101, b"13\n")], 12)
    return td


def test_createtaxdb_mapping_parity(ptax):
    assert (ptax / "ptax_mapping").read_bytes() == \
        (TAX2 / "ptax_mapping").read_bytes()


def test_createtaxdb_binary_taxonomy_parity(ptax):
    mine = (ptax / "ptax_taxonomy").read_bytes()
    golden = (TAX2 / "ptax_taxonomy").read_bytes()
    assert len(mine) == len(golden)
    assert mask_node_padding(mine) == mask_node_padding(golden)


def test_createbintaxonomy_parity(tmp_path):
    out = tmp_path / "tax.bin"
    mmtax.createbintaxonomy(TAX2 / "taxdump" / "names.dmp",
                            TAX2 / "taxdump" / "nodes.dmp",
                            TAX2 / "taxdump" / "merged.dmp", out)
    mine = out.read_bytes()
    golden = (TAX2 / "taxonomy.bin").read_bytes()
    assert len(mine) == len(golden)
    assert mask_node_padding(mine) == mask_node_padding(golden)


def test_binary_roundtrip_matches_dumps():
    t_dmp = mmtax.Taxonomy.from_dumps(TAX2 / "taxdump" / "names.dmp",
                                      TAX2 / "taxdump" / "nodes.dmp",
                                      TAX2 / "taxdump" / "merged.dmp")
    t_bin = mmtax.Taxonomy.from_binary((TAX2 / "taxonomy.bin").read_bytes())
    assert t_bin.tax_ids == t_dmp.tax_ids
    assert t_bin.parent_ids == t_dmp.parent_ids
    assert t_bin.ranks == t_dmp.ranks
    assert t_bin.names == t_dmp.names
    assert t_bin.D == t_dmp.D
    assert t_bin.max_taxid == t_dmp.max_taxid
    # merged ids resolve to the merged-into node
    assert t_bin.node_taxid(999) == 5145
    assert t_bin.lca_list([5432, 2987]) == 5543
    assert t_bin.is_ancestor(2759, 5432)
    assert not t_bin.is_ancestor(2, 5432)


def test_createbintaxmapping_parity(ptax, tmp_path):
    out = tmp_path / "mapping.bin"
    mmtax.createbintaxmapping(str(ptax / "ptax_mapping"), str(out))
    assert out.read_bytes() == (TAX2 / "mapping.bin").read_bytes()
    # binary mapping loads back with identical lookups
    m = mmtax.MappingReader(str(out), db_input=False)
    assert m.lookup(0) == 5145 and m.lookup(1) == 999 and m.lookup(5) == 0


def test_createdmptaxonomy_parity(ptax, tmp_path):
    mmtax.createdmptaxonomy(str(ptax / "ptax"), str(tmp_path / "dmpout"))
    for s in ("_nodes.dmp", "_names.dmp", "_merged.dmp"):
        assert (tmp_path / f"dmpout{s}").read_bytes() == \
            (TAX2 / f"dmpout{s}").read_bytes(), s


LCA_VARIANTS = [
    ("lca_default", {}),
    ("lca_ranks", {"lca_ranks": "species,genus,family,superkingdom"}),
    ("lca_lin1", {"tax_lineage": 1}),
    ("lca_lin2", {"tax_lineage": 2}),
    ("lca_nobl", {"blacklist": ""}),
    ("lca_blname",
     {"blacklist": "12908:wrong name,28384:other sequences"}),
]


@pytest.mark.parametrize("name,kwargs", LCA_VARIANTS)
def test_lca_parity(ptax, tmp_path, name, kwargs):
    out = tmp_path / name
    mmtax.lca_db(str(ptax / "ptax"), str(ptax / "res"), str(out), **kwargs)
    assert_db_equal(out, TAX2 / name)


MAJ_VARIANTS = [
    ("maj_v1", {}),
    ("maj_v0", {"vote_mode": 0}),
    ("maj_v2", {"vote_mode": 2}),
    ("maj_thr", {"majority_thr": 0.9}),
]


@pytest.mark.parametrize("name,kwargs", MAJ_VARIANTS)
def test_majoritylca_parity(ptax, tmp_path, name, kwargs):
    out = tmp_path / name
    mmtax.lca_db(str(ptax / "ptax"), str(ptax / "res"), str(out),
                 majority=True, **kwargs)
    assert_db_equal(out, TAX2 / name)


def test_aggregatetax_parity(ptax, tmp_path):
    out = tmp_path / "aggtax"
    mmtax.aggregatetax_db(str(ptax / "ptax"), str(ptax / "sets"),
                          str(ptax / "lca_default"), str(out),
                          lca_ranks="genus,superkingdom")
    assert_db_equal(out, TAX2 / "aggtax")


def test_aggregatetaxweights_parity(ptax, tmp_path):
    out = tmp_path / "aggw"
    mmtax.aggregatetax_db(str(ptax / "ptax"), str(ptax / "sets"),
                          str(ptax / "lca_default"), str(out),
                          aln_seq_db=str(ptax / "res"))
    assert_db_equal(out, TAX2 / "aggw")


def test_addtaxonomy_parity(ptax, tmp_path):
    out = tmp_path / "addtax"
    mmtax.addtaxonomy_db(str(ptax / "ptax"), str(ptax / "res"), str(out))
    assert_db_equal(out, TAX2 / "addtax")
    out2 = tmp_path / "addtax_ranks"
    mmtax.addtaxonomy_db(str(ptax / "ptax"), str(ptax / "res"), str(out2),
                         lca_ranks="species,phylum", tax_lineage=1)
    assert_db_equal(out2, TAX2 / "addtax_ranks")
    # query-key mode on the self-result DB (keys 0..5)
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / "utils" / f"selfres{s}",
                        tmp_path / f"selfres{s}")
    out3 = tmp_path / "addtax_q"
    mmtax.addtaxonomy_db(str(ptax / "ptax"), str(tmp_path / "selfres"),
                         str(out3), pick_id_from=1)
    assert_db_equal(out3, TAX2 / "addtax_q")


FTD_VARIANTS = [
    ("ftd_num", "2759"),
    ("ftd_expr", "2||562"),
    ("ftd_not", "!2759"),
    ("ftd_comma", "562,5145"),
]


@pytest.mark.parametrize("name,expr", FTD_VARIANTS)
def test_filtertaxdb_parity(ptax, tmp_path, name, expr):
    out = tmp_path / name
    mmtax.filtertaxdb_db(str(ptax / "ptax"), str(ptax / "lca_default"),
                         str(out), expr)
    assert_db_equal(out, TAX2 / name)


def test_filtertaxseqdb_parity(ptax, tmp_path):
    out = tmp_path / "ftsq_hard"
    mmtax.filtertaxseqdb_db(str(ptax / "ptax"), str(out), "2759")
    assert_db_equal(out, TAX2 / "ftsq_hard")
    out2 = tmp_path / "ftsq_soft"
    mmtax.filtertaxseqdb_db(str(ptax / "ptax"), str(out2), "2759",
                            subdb_mode=1)
    assert (tmp_path / "ftsq_soft.index").read_bytes() == \
        (TAX2 / "ftsq_soft.index").read_bytes()


def test_taxonomyreport_kraken_parity(ptax, tmp_path):
    out = tmp_path / "report"
    mmtax.taxonomyreport_db(str(ptax / "ptax"), str(ptax / "lca_default"),
                            str(out))
    assert out.read_bytes() == (TAX2 / "report_kraken").read_bytes()
    mmtax.taxonomyreport_db(str(ptax / "ptax"), str(ptax / "res"), str(out))
    assert out.read_bytes() == (TAX2 / "report_kraken_aln").read_bytes()
    mmtax.taxonomyreport_db(str(ptax / "ptax"), str(ptax / "ptax"), str(out))
    assert out.read_bytes() == (TAX2 / "report_kraken_seq").read_bytes()


def test_taxonomyreport_krona_payload_parity(ptax, tmp_path):
    """The Krona XML payload matches; the HTML prelude is our own
    (the reference embeds the upstream Krona resource)."""
    out = tmp_path / "krona"
    mmtax.taxonomyreport_db(str(ptax / "ptax"), str(ptax / "lca_default"),
                            str(out), report_mode=1)
    marker = b'<node name="all">'
    mine = out.read_bytes()
    golden = (TAX2 / "report_krona").read_bytes()
    assert marker in mine and marker in golden
    assert mine[mine.index(marker):] == golden[golden.index(marker):]
