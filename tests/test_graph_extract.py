"""Graph construction + window enumeration parity vs the reference oracle.

Mirrors the reference's ``test_sequence_extraction``
(``tests/grafimo_run_test.py:49-65``): build the toy graph from
``test.fa`` + ``test.vcf.gz`` and compare the k=19 window table for region
``x:0-20`` against ``expected_seqs.tsv``.

All columns are compared except the haplotype-frequency column: the
reference's bundled toy GBWT yields frequency 0 for every window (including
windows exactly matching a sample haplotype), an artifact its test
inherited.  This engine counts haplotypes correctly; the frequency semantics
are asserted separately below.
"""

import numpy as np
import pandas as pd
import pytest

from grafimo_tpu.graph.extract import extract_region, write_windows_tsv
from grafimo_tpu.graph.sitegraph import SiteGraph, build_graph
from grafimo_tpu.io.fasta import read_fasta
from grafimo_tpu.io.vcf import iter_vcf_records


@pytest.fixture(scope="module")
def toy_graph(input_dir):
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    return build_graph("x", seqs["x"], records)


def test_toy_graph_structure(toy_graph):
    # expected node decomposition (derived from the oracle's node paths):
    # 1: ref[0:8], 2: alt A @9, 3: ref G, 4: alt T @10, 5: ref C,
    # 6: ref[10:13], 7: alt A @14, 8: ref G, 9: ref[14:33], ...
    g = toy_graph
    assert g.node_seqs[1] == "CAAATAAG"
    assert g.node_seqs[2] == "A" and not g.node_is_ref[2]
    assert g.node_seqs[3] == "G" and g.node_is_ref[3]
    assert g.node_seqs[4] == "T" and not g.node_is_ref[4]
    assert g.node_seqs[5] == "C" and g.node_is_ref[5]
    assert g.node_seqs[6] == "TTG"
    assert g.node_seqs[9] == "AAATTTTCTGGAGTTCTAT"
    assert g.haplo is not None and g.haplo.n_hap == 2


def test_extraction_oracle_parity(toy_graph, expected_dir, tmp_path):
    batch = extract_region(toy_graph, 0, 20, 19)
    out = tmp_path / "seqs_extracted.tsv"
    write_windows_tsv(batch, str(out))
    result = pd.read_csv(out, sep="\t", header=None).sort_values([1, 2, 3])
    result.index = range(len(result))
    expected = pd.read_csv(
        expected_dir / "expected_seqs.tsv", sep="\t", header=None
    ).sort_values([1, 2, 3])
    expected.index = range(len(expected))
    assert len(result) == len(expected) == 32
    # compare every column except haplotype frequency (col 4, see module doc)
    for col in [0, 1, 2, 3, 5, 6]:
        pd.testing.assert_series_equal(
            result[col], expected[col], check_names=False
        )


def test_haplotype_frequencies(toy_graph):
    """Sample GTs: hap0 carries alts at pos 9,10,14; hap1 the alt at 10."""
    batch = extract_region(toy_graph, 0, 20, 19)
    freq = {
        (batch.seqs[i], batch.strands[i]): int(batch.freqs[i])
        for i in range(len(batch))
    }
    # hap0's window (alt at all three sites)
    assert freq[("CAAATAAGATTTGAAAATT", "+")] == 1
    # hap1's window (ref at 9 and 14, alt at 10)
    assert freq[("CAAATAAGGTTTGGAAATT", "+")] == 1
    # the pure reference window matches no haplotype (site 10 is hom-alt)
    assert freq[("CAAATAAGGCTTGGAAATT", "+")] == 0
    # recombinant never observed
    assert freq[("CAAATAAGACTTGAAAATT", "+")] == 0
    # strands share the walk, hence the frequency
    from grafimo_tpu.graph.extract import revcomp

    assert freq[(revcomp("CAAATAAGATTTGAAAATT"), "-")] == freq[
        ("CAAATAAGATTTGAAAATT", "+")
    ]


def test_graph_roundtrip(toy_graph, tmp_path):
    p = tmp_path / "x.gvt.npz"
    toy_graph.save(str(p))
    g2 = SiteGraph.load(str(p))
    assert g2.node_seqs == toy_graph.node_seqs
    assert g2.elements == toy_graph.elements
    assert g2.haplo.n_hap == 2
    b1 = extract_region(toy_graph, 0, 20, 19)
    b2 = extract_region(g2, 0, 20, 19)
    assert b1.seqs == b2.seqs
    assert (b1.freqs == b2.freqs).all()
    assert b1.paths == b2.paths


def test_gvt_v1_format_still_loads(toy_graph, tmp_path):
    """Round-3 .gvt files (JSON site metadata) keep loading after the
    v2 flat-array serialization."""
    import json

    import numpy as np

    from grafimo_tpu.graph.sitegraph import SiteGraph

    g = toy_graph
    meta = {
        "chrom": g.chrom,
        "sites": [
            {"s": s.ref_start, "e": s.ref_end, "a": s.alleles,
             "n": s.allele_nodes}
            for s in g.sites
        ],
        "segments": g.segments,
        "elements": g.elements,
    }
    arrays = {
        "meta": np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        ),
        "seq": np.frombuffer(g.seq.encode("ascii"), dtype=np.uint8),
        "node_ref_start": g.node_ref_start,
        "node_ref_end": g.node_ref_end,
        "node_is_ref": g.node_is_ref,
        "node_seqs": np.frombuffer(
            "\n".join(g.node_seqs).encode("ascii"), dtype=np.uint8
        ),
    }
    if g.haplo is not None:
        arrays.update(g.haplo.to_arrays())
    path = tmp_path / "v1.gvt.npz"
    np.savez_compressed(path, **arrays)
    g2 = SiteGraph.load(str(path))
    assert g2.seq == g.seq
    assert len(g2.sites) == len(g.sites)
    assert [s.alleles for s in g2.sites] == [s.alleles for s in g.sites]
    assert g2.elements == g.elements
    assert (g2.haplo is None) == (g.haplo is None)
    if g.haplo is not None:
        assert g2.haplo.n_hap == g.haplo.n_hap
        assert (g2.haplo.alt_bits == g.haplo.alt_bits).all()
