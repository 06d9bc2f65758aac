"""Multi-motif, mixed-width and multi-chromosome workflow coverage
(BASELINE.json configs: multi-motif batch, whole-genome multi-graph)."""

import numpy as np
import pandas as pd
import pytest

from grafimo_tpu.cli import main
from grafimo_tpu.models.parse import load_motifs, parse_meme
from grafimo_tpu.utils.constants import UNIF


def test_meme_multi_motif_parse(input_dir):
    motifs = parse_meme(str(input_dir / "multi.meme"))
    assert [m.motif_id for m in motifs] == [
        "MA0139.1", "SYN0008.1", "SYN0012.1"
    ]
    assert [m.width for m in motifs] == [19, 8, 12]
    processed = load_motifs(str(input_dir / "multi.meme"), UNIF, 0.1, False)
    assert len(processed) == 3
    for m in processed:
        assert m.pval_table.shape == (1000 * m.width + 1,)
    # CTCF inside the multi-motif file must process identically to the
    # single-motif file
    single = load_motifs(str(input_dir / "MA0139.1.meme"), UNIF, 0.1, False)[0]
    np.testing.assert_array_equal(
        processed[0].score_matrix, single.score_matrix
    )


@pytest.fixture()
def two_chrom_setup(tmp_path):
    rng = np.random.default_rng(11)
    fa = tmp_path / "genome.fa"
    seqs = {}
    with open(fa, "w") as f:
        for chrom, ln in [("1", 400), ("2", 300)]:
            seq = "".join(rng.choice(list("ACGT"), ln))
            seqs[chrom] = seq
            f.write(f">{chrom}\n{seq}\n")
    vcf = tmp_path / "vars.vcf"
    with open(vcf, "w") as f:
        f.write("##fileformat=VCFv4.1\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n")
        for chrom in ("1", "2"):
            for pos in (50, 120, 200):
                ref = seqs[chrom][pos - 1]
                alt = {"A": "C", "C": "G", "G": "T", "T": "A"}[ref]
                f.write(
                    f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t99\t.\t.\tGT\t1|0\n"
                )
    bed = tmp_path / "regions.bed"
    bed.write_text("chr1\t0\t400\nchr2\t0\t300\n")
    return fa, vcf, bed, tmp_path


def test_multi_chrom_multi_width_end_to_end(input_dir, two_chrom_setup):
    fa, vcf, bed, tmp_path = two_chrom_setup
    graph_dir = tmp_path / "graphs"
    graph_dir.mkdir()
    assert main(
        ["buildvg", "-l", str(fa), "-v", str(vcf), "-o", str(graph_dir)]
    ) == 0
    assert (graph_dir / "1.gvt.npz").exists()
    assert (graph_dir / "2.gvt.npz").exists()
    outdir = tmp_path / "out"
    rc = main(
        [
            "findmotif",
            "-d", str(graph_dir),
            "-b", str(bed),
            "-m", str(input_dir / "multi.meme"),
            "-t", "1", "--recomb",
            "-o", str(outdir),
            "--verbose",
        ]
    )
    assert rc == 0
    # one report set per motif, files prefixed with the motif id
    for mid in ("MA0139.1", "SYN0008.1", "SYN0012.1"):
        tsv = outdir / f"grafimo_out_{mid}.tsv"
        assert tsv.exists()
        df = pd.read_csv(tsv, sep="\t", index_col=0)
        assert set(df["motif_id"]) == {mid}
        assert set(df["sequence_name"]) <= {"1:0-400", "2:0-300"}
        assert len(df) > 0


def test_engines_agree_multi_chrom(input_dir, two_chrom_setup, tmp_path):
    fa, vcf, bed, base = two_chrom_setup
    graph_dir = base / "graphs2"
    graph_dir.mkdir()
    assert main(
        ["buildvg", "-l", str(fa), "-v", str(vcf), "-o", str(graph_dir)]
    ) == 0
    outs = {}
    for engine in ("runs", "windows"):
        outdir = base / f"out_{engine}"
        rc = main(
            [
                "findmotif",
                "-d", str(graph_dir),
                "-b", str(bed),
                "-m", str(input_dir / "MA0139.1.meme"),
                "-t", "1", "--recomb",
                "--engine", engine,
                "-o", str(outdir),
            ]
        )
        assert rc == 0
        outs[engine] = (
            pd.read_csv(outdir / "grafimo_out.tsv", sep="\t", index_col=0)
            .sort_values(
                ["sequence_name", "p-value", "start", "stop", "strand",
                 "matched_sequence"]
            )
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(
        outs["runs"], outs["windows"], check_exact=True
    )


def test_pooled_motif_processing_bit_identical(tmp_path):
    """A 50-motif MEME file processes through the process pool with
    results bit-identical to the sequential pipeline (reference pools
    MEME files the same way, motif_ops.py:303-348)."""
    from grafimo_tpu.models.background import load_bg
    from grafimo_tpu.models.parse import _prepare_meme_motif, process_motifs
    from grafimo_tpu.models.process import process_motif

    rng = np.random.default_rng(7)
    lines = ["MEME version 4", "", "ALPHABET= ACGT", ""]
    for i in range(50):
        w = int(rng.integers(8, 25))
        lines.append(f"MOTIF S{i:03d}")
        lines.append(
            f"letter-probability matrix: alength= 4 w= {w} "
            f"nsites= {int(rng.integers(20, 400))} E= 0"
        )
        for _ in range(w):
            p = rng.dirichlet([1.0] * 4)
            lines.append(" ".join(f"{x:.6f}" for x in p))
        lines.append("")
    path = tmp_path / "fifty.meme"
    path.write_text("\n".join(lines))
    motifs = load_motifs(str(path), UNIF, 0.1, False)
    assert len(motifs) == 50
    bgs = load_bg(UNIF, False)
    seq = [
        process_motif(_prepare_meme_motif(m, bgs, 0.1))
        for m in parse_meme(str(path))
    ]
    for got, want in zip(motifs, seq):
        np.testing.assert_array_equal(got.score_matrix, want.score_matrix)
        np.testing.assert_array_equal(got.pval_table, want.pval_table)
        assert got.scale == want.scale and got.offset == want.offset
