"""Binary GBWT reader tests (graph/gbwt.py).

Fixtures are real vg-produced indexes: ``x_toy.gbwt`` is the reference's
toy ``expected.gbwt`` (built from tests/data/input/test.fa + test.vcf.gz),
``xy_[xy].gbwt`` are the reference tutorial's indexes (built from
tutorials/data/xy.fa + xy2.vcf.gz by ``vg index -G``)."""

import numpy as np
import pytest

from grafimo_tpu.graph.gbwt import gbwt_walks, read_gbwt
from grafimo_tpu.graph.gfa import (
    _haplotype_walks,
    gfa_to_sitegraph,
    sitegraph_to_gfa,
)
from grafimo_tpu.graph.sitegraph import build_graph
from grafimo_tpu.io.fasta import read_fasta
from grafimo_tpu.io.vcf import iter_vcf_records


def _toy_graph(input_dir):
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    return build_graph("x", seqs["x"], records)


def test_header_and_metadata(input_dir):
    idx = read_gbwt(str(input_dir / "x_toy.gbwt"))
    assert idx.version == 4
    assert idx.bidirectional
    assert idx.sequences == 4 and idx.n_paths == 2
    assert idx.haplotype_count == 2
    assert idx.sample_names == ["1"]
    assert idx.contig_names == ["x"]
    assert [(p.sample, p.contig, p.phase) for p in idx.path_names] == [
        (0, 0, 0), (0, 0, 1),
    ]


def test_toy_walks_match_vcf_graph(input_dir):
    """The GBWT's walks must equal the haplotype walks derived from the
    phased VCF (same graph, same node numbering — toy fixture parity)."""
    graph = _toy_graph(input_dir)
    ours = _haplotype_walks(graph)
    idx = read_gbwt(str(input_dir / "x_toy.gbwt"))
    theirs = idx.path_walks()
    assert len(ours) == len(theirs) == 2
    for (h, w1), (j, w2) in zip(ours, theirs):
        assert all(n % 2 == 0 for n in w2)  # forward orientation
        assert w1 == [n >> 1 for n in w2]


@pytest.mark.parametrize("name", ["x_toy", "xy_x", "xy_y"])
def test_bidirectional_consistency(input_dir, name):
    """In a bidirectional index, sequence 2j+1 is the reverse orientation
    of sequence 2j — a deep check of the LF navigation."""
    idx = read_gbwt(str(input_dir / f"{name}.gbwt"))
    assert idx.bidirectional
    total = 0
    for j in range(idx.n_paths):
        fwd = idx.extract(2 * j)
        rev = idx.extract(2 * j + 1)
        # reverse orientation: reversed node order, orientation bit flipped
        assert rev == [n ^ 1 for n in reversed(fwd)]
        total += len(fwd) + len(rev)
    assert total + idx.sequences == idx.size  # endmarkers complete the BWT


def test_gbwt_sidecar_restores_haplotypes(input_dir, tmp_path):
    """End-to-end: export the toy graph to GFA *without* W lines, attach
    the vg .gbwt as a sidecar, and reimport — the haplotype index must be
    bit-identical to the VCF-built one."""
    from grafimo_tpu.workflows import load_graph_file

    graph = _toy_graph(input_dir)
    gfa = tmp_path / "x.gfa"
    sitegraph_to_gfa(graph, str(gfa), include_haplotypes=False)
    bare = gfa_to_sitegraph(str(gfa))
    assert bare.haplo is None
    (tmp_path / "x.gbwt").write_bytes(
        (input_dir / "x_toy.gbwt").read_bytes()
    )
    g2 = load_graph_file(str(gfa))
    assert g2.haplo is not None
    assert g2.haplo.n_hap == graph.haplo.n_hap
    assert g2.haplo.site_allele_rows == graph.haplo.site_allele_rows
    np.testing.assert_array_equal(g2.haplo.alt_bits, graph.haplo.alt_bits)


def test_gbwt_walk_tuples(input_dir):
    walks = gbwt_walks(str(input_dir / "xy_x.gbwt"))
    assert [(s, h, c) for s, h, c, _n in walks] == [
        ("1", 0, "x"), ("1", 1, "x"),
    ]
    assert all(len(n) > 10 for *_x, n in walks)


def test_not_a_gbwt(tmp_path):
    from grafimo_tpu.errors import GraphError

    bad = tmp_path / "bad.gbwt"
    bad.write_bytes(b"this is not a gbwt file at all, not even close....")
    with pytest.raises(GraphError):
        read_gbwt(str(bad))
