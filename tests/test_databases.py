"""databases catalog tests: --tsv listing is byte-identical to the
reference (tests/golden/databases.tsv, `metaeuk databases --tsv 1`);
local-file builds run the createdb path; plain downloads refuse with a
clear egress error.
"""

import pathlib

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "databases.tsv"
DATA = pathlib.Path(__file__).parent / "data"


def test_list_tsv_parity():
    from metaeuk_tpu.pipeline.databases import list_tsv
    assert list_tsv() == GOLDEN.read_text()


def test_download_requires_local_file(tmp_path):
    from metaeuk_tpu.pipeline.databases import download
    with pytest.raises(RuntimeError, match="egress"):
        download("UniRef50", str(tmp_path / "db"), str(tmp_path / "tmp"))
    with pytest.raises(ValueError, match="unknown database"):
        download("NoSuchDB", str(tmp_path / "db"), str(tmp_path / "tmp"))


def test_local_file_build(tmp_path):
    from metaeuk_tpu.io import mmseqsdb
    from metaeuk_tpu.pipeline.databases import download
    download("PDB", str(tmp_path / "db"), str(tmp_path / "tmp"),
             local_file=str(DATA / "proteins.faa"))
    assert len(mmseqsdb.read_db(str(tmp_path / "db"))) == 6


def test_profile_catalog_chain_byte_parity(tmp_path):
    """The databases.sh STOCKHOLM_MSA post-processing chain (convertmsa
    -> msa2profile --match-mode 1 --match-ratio 0.5, databases.sh:326-
    333) from a pre-fetched archive, byte-identical to the reference
    binary's chain on the committed fixture (reference msa2profile
    default --filter-msa 1 applies)."""
    import pathlib
    from metaeuk_tpu.pipeline.databases import download
    g = pathlib.Path(__file__).parent / "golden" / "dbcatalog"
    out = tmp_path / "prof"
    download("Pfam-A.seed", str(out), str(tmp_path / "t"),
             local_file=str(g / "mini.msa.gz"))
    for suf in ("", ".index", ".dbtype"):
        assert (tmp_path / f"prof{suf}").read_bytes() \
            == (g / f"refprof{suf}").read_bytes(), suf


def test_pdb70_a3m_chain_byte_parity(tmp_path):
    """The PDB70 A3M chain (databases.sh:164-171 awk tar repack +
    msa2profile --msa-type 1 --match-mode 1 --match-ratio 0.5) from a
    pre-fetched archive: both the intermediate MSA DB (vs the awk run
    from the reference's own databases.sh) and the final profile DB are
    byte-identical to the reference chain on the committed fixture
    (tools/make_a3m_goldens.sh)."""
    import pathlib
    from metaeuk_tpu.pipeline.databases import download, \
        _pdb70_tar_to_msadb
    g = pathlib.Path(__file__).parent / "golden" / "databases"
    if not (g / "pdb70_prof.dbtype").exists():
        pytest.skip("goldens not generated (tools/make_a3m_goldens.sh)")
    msa = tmp_path / "msa"
    _pdb70_tar_to_msadb(str(DATA / "pdb70_fixture.tar.gz"), str(msa))
    for suf in ("", ".index"):
        assert (tmp_path / f"msa{suf}").read_bytes() \
            == (g / f"pdb70_msa{suf}").read_bytes(), f"msa{suf}"
    out = tmp_path / "prof"
    download("PDB70", str(out), str(tmp_path / "t"),
             local_file=str(DATA / "pdb70_fixture.tar.gz"))
    for suf in ("", ".index", ".dbtype"):
        assert (tmp_path / f"prof{suf}").read_bytes() \
            == (g / f"pdb70_prof{suf}").read_bytes(), suf


def test_cdd_fasta_msa_chain_byte_parity(tmp_path):
    """The CDD FASTA_MSA chain (databases.sh:222-229: tar2db
    --output-dbtype 11, lookup suffix fix, msa2profile --skip-query)
    from a pre-fetched archive, byte-identical to the reference chain
    on the committed fixture."""
    import pathlib
    from metaeuk_tpu.pipeline.databases import download
    g = pathlib.Path(__file__).parent / "golden" / "databases"
    if not (g / "cdd_prof.dbtype").exists():
        pytest.skip("goldens not generated (tools/make_a3m_goldens.sh)")
    out = tmp_path / "prof"
    download("CDD", str(out), str(tmp_path / "t"),
             local_file=str(DATA / "cdd_fixture.tar.gz"))
    lookup = (tmp_path / "t" / "msa.lookup")
    assert lookup.read_bytes() == (g / "cdd_msa.lookup").read_bytes()
    for suf in ("", ".index", ".dbtype"):
        assert (tmp_path / f"prof{suf}").read_bytes() \
            == (g / f"cdd_prof{suf}").read_bytes(), suf
