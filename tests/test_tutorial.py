"""The shipped tutorial flow must work end to end (same data as the
reference's buildvg/findmotif tutorials: two chromosomes, indels, phased
haplotypes, a background file, 86 regions)."""

import pathlib
import shutil

import pandas as pd

from grafimo_tpu.cli import main

TUTORIAL = pathlib.Path(__file__).parent.parent / "tutorials"


def test_tutorial_flow(tmp_path):
    graph_dir = tmp_path / "mygenome"
    rc = main(
        [
            "buildvg",
            "-l", str(TUTORIAL / "data" / "xy.fa"),
            "-v", str(TUTORIAL / "data" / "xy2.vcf.gz"),
            "-o", str(graph_dir),
        ]
    )
    assert rc == 0
    assert (graph_dir / "x.gvt.npz").exists()
    assert (graph_dir / "y.gvt.npz").exists()
    outdir = tmp_path / "out"
    rc = main(
        [
            "findmotif",
            "-d", str(graph_dir),
            "-b", str(TUTORIAL / "data" / "regions.bed"),
            "-m", str(TUTORIAL / "data" / "example.meme"),
            "-k", str(TUTORIAL / "data" / "bg_nt"),
            "-t", "0.01",
            "-o", str(outdir),
        ]
    )
    assert rc == 0
    df = pd.read_csv(outdir / "grafimo_out.tsv", sep="\t", index_col=0)
    assert len(df) > 0
    assert set(df["motif_id"]) == {"EXAMPLE"}
    # hits on both strands, sorted by p-value
    assert (df["p-value"] < 0.01).all()
    assert df["p-value"].is_monotonic_increasing
    # indel windows present in the graph: spans can exceed the width
    assert (outdir / "grafimo_out.gff").exists()


def test_tutorial_namemap_build(tmp_path):
    """Build with the tutorial's chromosome name-map (x -> awesomeVG)."""
    graph_dir = tmp_path / "named"
    rc = main(
        [
            "buildvg",
            "-l", str(TUTORIAL / "data" / "xy.fa"),
            "-v", str(TUTORIAL / "data" / "xy2.vcf.gz"),
            "--chroms-namemap-build", str(TUTORIAL / "data" / "namemap.txt"),
            "-o", str(graph_dir),
        ]
    )
    assert rc == 0
    assert (graph_dir / "awesomeVG.gvt.npz").exists()
    assert (graph_dir / "FancyVG.gvt.npz").exists()
