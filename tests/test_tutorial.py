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


def test_tutorial_namemap_find(tmp_path):
    """findmotif resolves BED chromosome names through the find-side
    name-map (reference --chroms-namemap-find, extract_regions.py:135-226)
    and produces scores identical to the plain-named run."""
    plain_dir = tmp_path / "plain"
    named_dir = tmp_path / "named"
    for outdir, extra in [
        (plain_dir, []),
        (
            named_dir,
            [
                "--chroms-namemap-build",
                str(TUTORIAL / "data" / "namemap.txt"),
            ],
        ),
    ]:
        rc = main(
            [
                "buildvg",
                "-l", str(TUTORIAL / "data" / "xy.fa"),
                "-v", str(TUTORIAL / "data" / "xy2.vcf.gz"),
                "-o", str(outdir),
            ]
            + extra
        )
        assert rc == 0
    outs = {}
    for key, gdir, extra in [
        ("plain", plain_dir, []),
        (
            "named",
            named_dir,
            [
                "--chroms-namemap-find",
                str(TUTORIAL / "data" / "namemap.txt"),
            ],
        ),
    ]:
        odir = tmp_path / f"out_{key}"
        rc = main(
            [
                "findmotif",
                "-d", str(gdir),
                "-b", str(TUTORIAL / "data" / "regions.bed"),
                "-m", str(TUTORIAL / "data" / "example.meme"),
                "-k", str(TUTORIAL / "data" / "bg_nt"),
                "-t", "0.01",
                "-o", str(odir),
            ]
            + extra
        )
        assert rc == 0
        outs[key] = pd.read_csv(
            odir / "grafimo_out.tsv", sep="\t", index_col=0
        )
    a, b = outs["plain"], outs["named"]
    assert len(b) == len(a) > 0
    # identical windows/scores; sequence_name carries the mapped label
    for col in ["start", "stop", "strand", "score", "p-value", "q-value"]:
        assert (a[col].values == b[col].values).all(), col
    assert set(b["sequence_name"].str.split(":").str[0]) == {
        "awesomeVG", "FancyVG"
    }
