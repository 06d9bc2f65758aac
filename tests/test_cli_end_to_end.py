"""End-to-end CLI test on the toy data: buildvg then findmotif.

Drives the same flow as the reference tutorials (build the variation graph
from FASTA+VCF, scan it for the CTCF motif over a BED region) without any
external tool.
"""

import os

import pandas as pd
import pytest

from grafimo_tpu.cli import main


@pytest.fixture()
def toy_bed(tmp_path):
    bed = tmp_path / "regions.bed"
    bed.write_text("chrx\t0\t20\n")
    return bed


def test_buildvg_and_findmotif(input_dir, tmp_path, toy_bed, monkeypatch):
    graph_dir = tmp_path / "graphs"
    graph_dir.mkdir()
    rc = main(
        [
            "buildvg",
            "-l", str(input_dir / "test.fa"),
            "-v", str(input_dir / "test.vcf.gz"),
            "-o", str(graph_dir),
            "--verbose",
        ]
    )
    assert rc == 0
    assert (graph_dir / "x.gvt.npz").exists()

    outdir = tmp_path / "results"
    rc = main(
        [
            "findmotif",
            "-d", str(graph_dir),
            "-b", str(toy_bed),
            "-m", str(input_dir / "MA0139.1.jaspar"),
            "-t", "1",
            "--recomb",
            "--top-graphs", "1",
            "-o", str(outdir),
        ]
    )
    assert rc == 0
    report = outdir / "grafimo_out.tsv"
    assert report.exists()
    df = pd.read_csv(report, sep="\t", index_col=0)
    assert list(df.columns) == [
        "motif_id", "motif_alt_id", "sequence_name", "start", "stop",
        "strand", "score", "p-value", "q-value", "matched_sequence",
        "haplotype_frequency", "reference",
    ]
    # all 32 toy windows survive threshold=1 with --recomb
    assert len(df) == 32
    assert set(df["sequence_name"]) == {"x:0-20"}
    assert (outdir / "grafimo_out.html").exists()
    gff = (outdir / "grafimo_out.gff").read_text()
    assert gff.startswith("##gff-version 3\n")
    assert "nucleotide_motif" in gff
    assert (outdir / "top_graphs" / "x:0-20.dot").exists()


def test_findmotif_single_graph_text_only(
    input_dir, tmp_path, toy_bed, capsys
):
    graph_dir = tmp_path / "graphs"
    graph_dir.mkdir()
    assert main(
        [
            "buildvg",
            "-l", str(input_dir / "test.fa"),
            "-v", str(input_dir / "test.vcf.gz"),
            "-o", str(graph_dir),
        ]
    ) == 0
    rc = main(
        [
            "findmotif",
            "-g", str(graph_dir / "x.gvt.npz"),
            "-b", str(toy_bed),
            "-m", str(input_dir / "MA0139.1.meme"),
            "-t", "1",
            "--recomb",
            "--text-only",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "MA0139.1" in out and "matched_sequence" in out


def test_findmotif_noreverse_threshold(input_dir, tmp_path, toy_bed, capsys):
    graph_dir = tmp_path / "graphs"
    graph_dir.mkdir()
    assert main(
        [
            "buildvg",
            "-l", str(input_dir / "test.fa"),
            "-v", str(input_dir / "test.vcf.gz"),
            "-o", str(graph_dir),
        ]
    ) == 0
    rc = main(
        [
            "findmotif",
            "-d", str(graph_dir),
            "-b", str(toy_bed),
            "-m", str(input_dir / "MA0139.1.meme"),
            "-t", "1",
            "--recomb", "--no-reverse", "--no-qvalue",
            "--text-only",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "q-value" not in out


def test_cli_flag_validation(tmp_path):
    # buildvg rejects findmotif flags; findmotif needs exactly one graph src
    assert main(["buildvg", "-b", "x.bed", "-l", "a.fa", "-v", "a.vcf"]) == 1
    assert main(["findmotif", "-b", "x.bed", "-m", "m.meme"]) == 1


def test_scanned_counters_parity_across_engines(
    input_dir, tmp_path, toy_bed, capsys
):
    """The runs engine prints the reference's scanned-work counters
    (``Scanned sequences`` / ``Scanned nucleotides``,
    score_sequences.py:202-203) with the SAME totals as the per-window
    engine."""
    graph_dir = tmp_path / "graphs"
    graph_dir.mkdir()
    assert main(
        [
            "buildvg",
            "-l", str(input_dir / "test.fa"),
            "-v", str(input_dir / "test.vcf.gz"),
            "-o", str(graph_dir),
        ]
    ) == 0
    capsys.readouterr()

    def counters(engine):
        out = tmp_path / f"res_{engine}"
        assert main(
            [
                "findmotif",
                "-d", str(graph_dir),
                "-b", str(toy_bed),
                "-m", str(input_dir / "MA0139.1.jaspar"),
                "-t", "1", "--recomb",
                "--engine", engine,
                "-o", str(out),
            ]
        ) == 0
        lines = capsys.readouterr().out.splitlines()
        seqs = [l for l in lines if l.startswith("Scanned sequences:")]
        nucs = [l for l in lines if l.startswith("Scanned nucleotides:")]
        assert len(seqs) == 1 and len(nucs) == 1
        return int(seqs[0].split("\t")[1]), int(nucs[0].split("\t")[1])

    assert counters("runs") == counters("windows")
