"""Native .vg (vg protobuf) import/export.

The x_toy.vg fixture is the reference's vg-built artifact
(tests/test_data/expected_results/expected.vg — output of ``vg
construct`` on test.fa + test.vcf.gz), so importing it and comparing
against our own FASTA+VCF build is a true cross-toolchain differential:
vg's graph topology in, our site decomposition out.
"""

import numpy as np
import pytest

from grafimo_tpu.errors import GraphError
from grafimo_tpu.graph.enumerate import enumerate_region_windows
from grafimo_tpu.graph.sitegraph import build_graph
from grafimo_tpu.graph.vgproto import (
    parse_vg,
    sitegraph_to_vg,
    vg_to_sitegraph,
)
from grafimo_tpu.io.fasta import read_fasta
from grafimo_tpu.io.vcf import iter_vcf_records


@pytest.fixture(scope="module")
def toy_graph(input_dir):
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    return build_graph("x", seqs["x"], records)


def _windows(graph, rs, re_, k, freq=False):
    return sorted(
        (w.begin, w.end, w.seq, tuple(w.path), w.is_ref)
        + ((w.freq,) if freq else ())
        for w in enumerate_region_windows(graph, rs, re_, k)
    )


def test_parse_vg_fixture_structure(input_dir):
    """Raw wire parse of the vg-built toy graph: node set, reference
    path and edge count match vg's known construction of test.fa+vcf."""
    segments, links, paths, walks = parse_vg(str(input_dir / "x_toy.vg"))
    assert walks == []
    assert "x" in paths
    # the backbone spells the FASTA contig
    seqs = read_fasta(str(input_dir / "test.fa"))
    backbone = "".join(segments[n] for n, o in paths["x"])
    assert backbone == seqs["x"].upper()
    assert all(o == "+" for _n, o in paths["x"])
    # every link endpoint is a real node
    for u, _uo, v, _vo in links:
        assert u in segments and v in segments


def test_vg_import_differential_vs_fasta_vcf(input_dir):
    """vg-built .vg + .gbwt sidecar imports to the same windows
    (sequence, path, coords, ref-flag) as our own FASTA+VCF build."""
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    ours = build_graph("x", seqs["x"], records)
    theirs = vg_to_sitegraph(
        str(input_dir / "x_toy.vg"), gbwt=str(input_dir / "x_toy.gbwt")
    )
    assert theirs.chrom == "x"
    assert theirs.seq == ours.seq
    assert _windows(theirs, 0, 50, 19) == _windows(ours, 0, 50, 19)
    # haplotype panel arrived via the sidecar
    assert theirs.haplo is not None


def test_vg_import_without_gbwt(input_dir):
    g = vg_to_sitegraph(str(input_dir / "x_toy.vg"))
    assert g.haplo is None
    assert len(g.sites) > 0


def test_vg_roundtrip_random_indel_graph(tmp_path):
    """Export a random indel-rich SiteGraph to .vg, re-import, and
    require identical window enumeration (the export is BGZF protobuf,
    so this also exercises the block writer end to end)."""
    from tests.test_runs_differential import _random_graph

    rng = np.random.default_rng(11)
    g = _random_graph(rng, length=300, n_var=10)
    p = tmp_path / "r.vg"
    sitegraph_to_vg(g, str(p))
    g2 = vg_to_sitegraph(str(p))
    assert g2.node_seqs == g.node_seqs
    assert _windows(g2, 0, 300, 9) == _windows(g, 0, 300, 9)


def test_vg_export_is_bgzf(tmp_path, toy_graph):
    """Exports are real BGZF: every gzip member carries the htslib BC
    extra subfield and the stream ends with the 28-byte EOF marker."""
    p = tmp_path / "x.vg"
    sitegraph_to_vg(toy_graph, str(p))
    blob = p.read_bytes()
    assert blob[:4] == b"\x1f\x8b\x08\x04"
    assert b"BC" in blob[:20]
    assert blob.endswith(
        bytes.fromhex(
            "1f8b08040000000000ff0600424302001b0003000000000000000000"
        )
    )
    # and still standard-gzip decompressible
    import gzip

    assert len(gzip.decompress(blob)) > 0


def test_vg_reject_non_graph_stream(tmp_path):
    """A type-tagged stream that is not a Graph stream (e.g. GAM) fails
    with a clear error, not a protobuf decode crash."""
    import gzip as _gz

    p = tmp_path / "bad.vg"
    # group: count=2, tag "GAM", one 0-byte message
    p.write_bytes(_gz.compress(b"\x02\x03GAM\x00"))
    with pytest.raises(GraphError, match="GAM"):
        vg_to_sitegraph(str(p))


def test_workflow_loads_vg_natively(input_dir, tmp_path):
    """load_graph_file consumes .vg directly (with gbwt sidecar
    auto-detection) — the reference needed the vg binary for this
    (extract_regions.py:180)."""
    import shutil

    from grafimo_tpu.workflows import load_graph_file

    vg = tmp_path / "x.vg"
    shutil.copy(str(input_dir / "x_toy.vg"), vg)
    g = load_graph_file(str(vg))
    assert g.chrom == "x" and g.haplo is None
    shutil.copy(str(input_dir / "x_toy.gbwt"), tmp_path / "x.gbwt")
    g2 = load_graph_file(str(vg))
    assert g2.haplo is not None
