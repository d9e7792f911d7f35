import numpy as np
import pytest

from metaeuk_tpu.tax.ncbi import (
    AGG_TAX_MINUS_LOG_EVAL, AGG_TAX_UNIFORM, NcbiTaxonomy, WeightedTaxHit)


def toy_taxonomy():
    #        1 (root)
    #        2 (superkingdom Euk)
    #     10    20     (phylum A, phylum B)
    #   11 12   21     (species)
    parent = {1: 1, 2: 1, 10: 2, 20: 2, 11: 10, 12: 10, 21: 20}
    rank = {1: "no rank", 2: "superkingdom", 10: "phylum", 20: "phylum",
            11: "species", 12: "species", 21: "species"}
    name = {1: "root", 2: "Eukaryota", 10: "PhylA", 20: "PhylB",
            11: "SpA1", 12: "SpA2", 21: "SpB1"}
    return NcbiTaxonomy(parent, rank, name, merged={99: 11})


def test_lca_basics():
    t = toy_taxonomy()
    assert t.lca([11, 12]) == 10
    assert t.lca([11, 21]) == 2
    assert t.lca([11]) == 11
    assert t.lca([11, 0]) == 11
    # merged id resolution
    assert t.resolve(99) == 11
    assert t.lca([99, 12]) == 10
    assert t.is_ancestor(2, 11)
    assert not t.is_ancestor(20, 11)


def test_weighted_majority_lca_uniform():
    t = toy_taxonomy()
    hits = [WeightedTaxHit(11, 1.0, AGG_TAX_UNIFORM),
            WeightedTaxHit(11, 1.0, AGG_TAX_UNIFORM),
            WeightedTaxHit(21, 1.0, AGG_TAX_UNIFORM)]
    res = t.weighted_majority_lca(hits, 0.5)
    # 11 has 2/3 >= 0.5 and is the lowest-rank candidate
    assert res.taxon == 11
    assert res.assigned_seqs == 3
    assert res.seqs_agree == 2


def test_weighted_majority_lca_split_goes_up():
    t = toy_taxonomy()
    hits = [WeightedTaxHit(11, 1.0, AGG_TAX_UNIFORM),
            WeightedTaxHit(21, 1.0, AGG_TAX_UNIFORM)]
    res = t.weighted_majority_lca(hits, 0.6)
    # no leaf reaches 0.6; their LCA (2) has 100%
    assert res.taxon == 2
    assert res.seqs_agree == 2


def test_weighted_majority_lca_evalue_weights():
    t = toy_taxonomy()
    hits = [WeightedTaxHit(11, 1e-50, AGG_TAX_MINUS_LOG_EVAL),
            WeightedTaxHit(21, 1e-2, AGG_TAX_MINUS_LOG_EVAL)]
    res = t.weighted_majority_lca(hits, 0.5)
    assert res.taxon == 11  # much heavier weight


def test_at_ranks_and_lineage():
    t = toy_taxonomy()
    assert t.at_ranks(11, ["phylum", "species"]) == ["PhylA", "SpA1"]
    assert "p_PhylA" in t.tax_lineage(11)
