"""findmotif accepts a vg-exported GFA directly via -g."""

import pandas as pd

from grafimo_tpu.cli import main
from grafimo_tpu.graph.gfa import sitegraph_to_gfa
from grafimo_tpu.graph.sitegraph import build_graph
from grafimo_tpu.io.fasta import read_fasta
from grafimo_tpu.io.vcf import iter_vcf_records


def test_findmotif_on_gfa(input_dir, tmp_path):
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    graph = build_graph("x", seqs["x"], records)
    gfa = tmp_path / "x.gfa"
    sitegraph_to_gfa(graph, str(gfa))
    bed = tmp_path / "regions.bed"
    bed.write_text("chrx\t0\t50\n")
    outdir = tmp_path / "out"
    rc = main(
        [
            "findmotif",
            "-g", str(gfa),
            "-b", str(bed),
            "-m", str(input_dir / "MA0139.1.meme"),
            "-t", "1", "--recomb",
            "-o", str(outdir),
        ]
    )
    assert rc == 0
    df = pd.read_csv(outdir / "grafimo_out.tsv", sep="\t", index_col=0)
    assert len(df) > 0
    # W lines round-trip the haplotype index -> real frequencies
    assert (df["haplotype_frequency"] > 0).any()


def test_findmotif_gfa_in_dir(input_dir, tmp_path):
    """Directory mode resolves .gfa graphs when no .gvt is present."""
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    graph = build_graph("x", seqs["x"], records)
    gdir = tmp_path / "graphs"
    gdir.mkdir()
    sitegraph_to_gfa(graph, str(gdir / "x.gfa"))
    bed = tmp_path / "regions.bed"
    bed.write_text("chrx\t0\t50\n")
    outdir = tmp_path / "out"
    rc = main(
        [
            "findmotif", "-d", str(gdir), "-b", str(bed),
            "-m", str(input_dir / "MA0139.1.meme"),
            "-t", "1", "--recomb", "-o", str(outdir),
        ]
    )
    assert rc == 0
    df = pd.read_csv(outdir / "grafimo_out.tsv", sep="\t", index_col=0)
    assert len(df) > 0
