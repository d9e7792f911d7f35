"""offsetalignment + proteinaln2nucl byte parity vs the reference.

Scenarios (goldens from tools/make_offsetaln_goldens.sh):
- translated search: contig ORF alignments vs protein targets mapped
  back to contig coordinates (query-side x3 offsetting)
- nucl-nucl --search-type 3 with extractframes query + split target
- proteinaln2nucl: ORF-vs-ORF protein alignment re-scored at the
  nucleotide level (default gaps 5/2, seed-42 ALP Gumbel fit)
"""

import pathlib
import subprocess
import sys

import pytest

from metaeuk_tpu.pipeline.offsetaln import offsetalignment, proteinaln2nucl

HERE = pathlib.Path(__file__).parent
U = HERE / "golden" / "utils"
DATA = HERE / "data"


def _eq(out, ref):
    for s in ("", ".index", ".dbtype"):
        assert pathlib.Path(f"{out}{s}").read_bytes() \
            == pathlib.Path(f"{ref}{s}").read_bytes(), f"{ref}{s}"


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    td = tmp_path_factory.mktemp("offsetaln")
    for fasta, db in (("contigs.fna", "cdb"), ("proteins.faa", "tdb")):
        subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", "createdb",
                        str(DATA / fasta), str(td / db)],
                       check=True, capture_output=True)
    return td


def test_offsetalignment_translated(tmp_path, dbs):
    offsetalignment(str(dbs / "cdb"), str(U / "orfs"), str(dbs / "tdb"),
                    str(dbs / "tdb"), str(U / "orfaa_aln"),
                    str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "offaln")


def test_offsetalignment_nucl(tmp_path, dbs):
    offsetalignment(str(dbs / "cdb"), str(U / "nucl_qs"), str(dbs / "cdb"),
                    str(U / "nucl_ts"), str(U / "nucl_aln"),
                    str(tmp_path / "o"), search_type=3)
    _eq(tmp_path / "o", U / "nucl_offaln")


def test_proteinaln2nucl(tmp_path):
    subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", "translatenucs",
                    str(U / "orfs"), str(tmp_path / "orfsaa")],
                   check=True, capture_output=True)
    proteinaln2nucl(str(U / "orfs"), str(U / "orfs"),
                    str(tmp_path / "orfsaa"), str(tmp_path / "orfsaa"),
                    str(U / "orfself_aln"), str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "p2n")
