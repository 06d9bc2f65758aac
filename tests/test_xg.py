"""Native ``.xg`` import (graph/xg.py).

Fixtures are real vg-produced indexes: ``x_toy.xg`` is the reference's
``tests/test_data/expected_results/expected.xg`` and ``mygenome_xg/``
holds the findmotif tutorial's shipped ``{x,y}.xg`` + ``{x,y}.gbwt`` —
the exact inputs the reference scans with ``vg find -x chr.xg -H
chr.gbwt`` (reference ``extract_regions.py:180``).  Parity is checked
three ways: tuple-identical to the ``.vg`` protobuf decode of the same
graph, window-differential against the graph built from the tutorial's
FASTA+VCF provenance, and report-byte-identical through the CLI.
"""

import pathlib

import pandas as pd
import pytest

from grafimo_tpu.cli import main
from grafimo_tpu.errors import GraphError
from grafimo_tpu.graph.enumerate import enumerate_region_windows
from grafimo_tpu.graph.sitegraph import build_graph
from grafimo_tpu.graph.vgproto import parse_vg
from grafimo_tpu.graph.xg import read_xg, xg_to_sitegraph
from grafimo_tpu.io.fasta import read_fasta
from grafimo_tpu.io.vcf import iter_vcf_records
from grafimo_tpu.workflows import load_graph_file

TUTORIAL = pathlib.Path(__file__).parent.parent / "tutorials" / "data"


def test_xg_tuples_match_vg(input_dir):
    """expected.xg decodes to the same (segments, links, ref path) as
    the protobuf expected.vg of the same graph."""
    segs, links, paths = read_xg(str(input_dir / "x_toy.xg"))
    vsegs, vlinks, vpaths, _ = parse_vg(str(input_dir / "x_toy.vg"))
    assert segs == vsegs
    assert sorted(links) == sorted(vlinks)
    # .xg drops the _alt_* allele paths at vg-index time; the reference
    # backbone must match exactly
    assert set(paths) == {"x"}
    assert paths["x"] == vpaths["x"]


@pytest.mark.parametrize("chrom", ["x", "y"])
def test_xg_window_differential_vs_fasta_vcf(input_dir, chrom):
    """Windows enumerated from the shipped tutorial .xg+.gbwt equal the
    windows from the graph built from its FASTA+VCF provenance."""
    g_xg = xg_to_sitegraph(
        str(input_dir / "mygenome_xg" / f"{chrom}.xg"),
        gbwt=str(input_dir / "mygenome_xg" / f"{chrom}.gbwt"),
    )
    seqs = read_fasta(str(TUTORIAL / "xy.fa"))
    records = list(iter_vcf_records(str(TUTORIAL / "xy2.vcf.gz"), chrom))
    g_ref = build_graph(chrom, seqs[chrom], records)
    for start, stop in ((0, 120), (400, 560), (900, 1001)):
        for k in (11, 15):
            wa = sorted(
                (w.seq, w.begin, w.end, w.freq, w.is_ref, tuple(w.path))
                for w in enumerate_region_windows(g_xg, start, stop, k)
            )
            wb = sorted(
                (w.seq, w.begin, w.end, w.freq, w.is_ref, tuple(w.path))
                for w in enumerate_region_windows(g_ref, start, stop, k)
            )
            assert wa == wb


def test_findmotif_xg_dir_equals_built_graphs(input_dir, tmp_path):
    """The reference tutorial flow: findmotif -d <dir of .xg + .gbwt>
    produces the identical report to scanning graphs built from
    FASTA+VCF."""
    built = tmp_path / "mygenome"
    rc = main(
        [
            "buildvg",
            "-l", str(TUTORIAL / "xy.fa"),
            "-v", str(TUTORIAL / "xy2.vcf.gz"),
            "-o", str(built),
        ]
    )
    assert rc == 0
    outs = []
    for label, gdir in (
        ("xg", input_dir / "mygenome_xg"),
        ("gvt", built),
    ):
        outdir = tmp_path / f"out_{label}"
        rc = main(
            [
                "findmotif",
                "-d", str(gdir),
                "-b", str(TUTORIAL / "regions.bed"),
                "-m", str(TUTORIAL / "example.meme"),
                "-k", str(TUTORIAL / "bg_nt"),
                "-t", "0.05",
                "-o", str(outdir),
            ]
        )
        assert rc == 0
        outs.append((outdir / "grafimo_out.tsv").read_bytes())
    assert outs[0] == outs[1]
    df = pd.read_csv(tmp_path / "out_xg" / "grafimo_out.tsv", sep="\t",
                     index_col=0)
    assert len(df) > 0
    # haplotype frequencies came from the .gbwt sidecar, not freq-0
    assert (df["haplotype_frequency"] > 0).all()


def test_xg_gbwt_sidecar_via_loader(input_dir):
    """workflows.load_graph_file picks up the .gbwt sidecar next to a
    .xg automatically."""
    g = load_graph_file(str(input_dir / "mygenome_xg" / "x.xg"))
    assert g.chrom == "x"
    assert g.haplo is not None and g.haplo.n_hap == 2


def test_unparsable_xg_raises_conversion_error(tmp_path):
    """Only genuinely unparsable files fall back to the vg-conversion
    message."""
    bad = tmp_path / "bad.xg"
    bad.write_bytes(b"\x02\x02XG\x08garbage!")
    with pytest.raises(GraphError) as exc:
        load_graph_file(str(bad))
    assert "vg convert" in str(exc.value)


def test_truncated_xg_raises_conversion_error(input_dir, tmp_path):
    """A structurally damaged real file errors instead of mis-parsing."""
    data = (input_dir / "x_toy.xg").read_bytes()
    bad = tmp_path / "trunc.xg"
    bad.write_bytes(data[: len(data) // 2])
    with pytest.raises(GraphError):
        load_graph_file(str(bad))
