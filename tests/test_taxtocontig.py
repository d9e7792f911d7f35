"""taxtocontig byte parity vs the reference binary.

Goldens: reference `createtaxdb` on a toy NCBI taxdump + mapping, then
`taxtocontig contigsDB out.fas out.headersMap.tsv taxTargetDB reftax tmp
--threads 1` on the fixture's easy-predict outputs.
"""

import pathlib

import pytest

from metaeuk_tpu.io.seqdb import SeqDB, DBTYPE_AA
from metaeuk_tpu.params import Params
from metaeuk_tpu.tax.ncbi import NcbiTaxonomy
from metaeuk_tpu.tax.workflow import TaxToContig

DATA = pathlib.Path(__file__).parent / "data"
GOLDEN = pathlib.Path(__file__).parent / "golden"
TAX = GOLDEN / "tax"


def test_taxtocontig_byte_parity(tmp_path):
    params = Params()
    targets = SeqDB.from_fasta(DATA / "proteins.faa", DBTYPE_AA)
    tax = NcbiTaxonomy.from_dumps(TAX / "taxdump" / "names.dmp",
                                  TAX / "taxdump" / "nodes.dmp",
                                  TAX / "taxdump" / "merged.dmp")
    taxids = [0] * len(targets)
    acc_to_idx = {targets.accession(i): i for i in range(len(targets))}
    for line in (TAX / "tax_mapping.tsv").read_text().splitlines():
        acc, taxid = line.split()
        taxids[acc_to_idx[acc]] = int(taxid)

    # inputs: the fixture's easy-predict outputs (committed goldens)
    contigs = SeqDB.from_fasta(DATA / "contigs.fna", DBTYPE_AA)
    contig_accs = {i: contigs.accession(i) for i in range(len(contigs))}
    out = tmp_path / "mytax"
    TaxToContig(params, targets, taxids, tax).run(
        GOLDEN / "easypredict.fas", GOLDEN / "easypredict.headersMap.tsv",
        str(out), contig_accessions=contig_accs)
    for suffix in ("tax_per_pred", "tax_per_contig"):
        mine = pathlib.Path(f"{out}_{suffix}.tsv").read_bytes()
        golden = (TAX / f"reftax_{suffix}.tsv").read_bytes()
        assert mine == golden, suffix
