"""Haplotype-panel bootstrap for graphs imported without a GBWT/walk
index (reference's interactive indexing of a bare .vg,
``grafimo.py:134-162`` -> ``constructVG.py:343``, here the
non-interactive ``findmotif --vcf``)."""

import shutil

import pandas as pd

from grafimo_tpu.cli import main


def _run(graph, bed, motif, outdir, *extra):
    rc = main(
        [
            "findmotif",
            "-g", str(graph),
            "-b", str(bed),
            "-m", str(motif),
            "-t", "1",
            "-o", str(outdir),
            *extra,
        ]
    )
    assert rc == 0
    return pd.read_csv(outdir / "grafimo_out.tsv", sep="\t", index_col=0)


def test_bare_vg_with_vcf_builds_panel(input_dir, tmp_path):
    """.vg + --vcf scans haplotype-aware without a .gbwt sidecar and
    matches the sidecar run byte-for-byte."""
    bed = tmp_path / "regions.bed"
    bed.write_text("chrx\t0\t50\n")
    motif = input_dir / "MA0139.1.meme"
    # bare graph: no sidecar next to it
    bare = tmp_path / "bare"
    bare.mkdir()
    shutil.copy(input_dir / "x_toy.vg", bare / "x.vg")
    df_vcf = _run(
        bare / "x.vg", bed, motif, tmp_path / "out_vcf",
        "--vcf", str(input_dir / "test.vcf.gz"),
    )
    assert len(df_vcf) > 0
    assert (df_vcf["haplotype_frequency"] > 0).any()
    # sidecar run for comparison
    withgbwt = tmp_path / "sidecar"
    withgbwt.mkdir()
    shutil.copy(input_dir / "x_toy.vg", withgbwt / "x.vg")
    shutil.copy(input_dir / "x_toy.gbwt", withgbwt / "x.gbwt")
    df_gbwt = _run(withgbwt / "x.vg", bed, motif, tmp_path / "out_gbwt")
    pd.testing.assert_frame_equal(df_vcf, df_gbwt)


def test_bare_vg_without_vcf_warns_freq0(input_dir, tmp_path, capsys):
    """Without --vcf a haplotype-less import warns loudly and reports
    frequency 0 (reference toy-GBWT semantics), so hits survive only
    under --recomb."""
    bed = tmp_path / "regions.bed"
    bed.write_text("chrx\t0\t50\n")
    bare = tmp_path / "bare"
    bare.mkdir()
    shutil.copy(input_dir / "x_toy.vg", bare / "x.vg")
    df = _run(
        bare / "x.vg", bed, input_dir / "MA0139.1.meme",
        tmp_path / "out", "--recomb",
    )
    err = capsys.readouterr().err
    assert "no haplotype index" in err and "--vcf" in err
    assert (df["haplotype_frequency"] == 0).all()


def test_wrong_chrom_vcf_errors(input_dir, tmp_path):
    """A --vcf with no records for the graph's chromosome is a hard
    error, not a silent freq-0 scan."""
    bed = tmp_path / "regions.bed"
    bed.write_text("chrx\t0\t50\n")
    bare = tmp_path / "bare"
    bare.mkdir()
    shutil.copy(input_dir / "x_toy.vg", bare / "x.vg")
    vcf = tmp_path / "other.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
        "z\t9\t.\tG\tA\t99\tPASS\t.\tGT\t1|0\n"
    )
    rc = main(
        [
            "findmotif",
            "-g", str(bare / "x.vg"),
            "-b", str(bed),
            "-m", str(input_dir / "MA0139.1.meme"),
            "-t", "1",
            "-o", str(tmp_path / "out"),
            "--vcf", str(vcf),
        ]
    )
    assert rc == 1  # reference error discipline: red line + exit 1


def test_graph_with_panel_ignores_vcf(input_dir, tmp_path):
    """--vcf is a no-op for graphs that already carry haplotypes."""
    bed = tmp_path / "regions.bed"
    bed.write_text("chrx\t0\t50\n")
    withgbwt = tmp_path / "sidecar"
    withgbwt.mkdir()
    shutil.copy(input_dir / "x_toy.vg", withgbwt / "x.vg")
    shutil.copy(input_dir / "x_toy.gbwt", withgbwt / "x.gbwt")
    df_a = _run(withgbwt / "x.vg", bed, input_dir / "MA0139.1.meme",
                tmp_path / "out_a",
                "--vcf", str(input_dir / "test.vcf.gz"))
    df_b = _run(withgbwt / "x.vg", bed, input_dir / "MA0139.1.meme",
                tmp_path / "out_b")
    pd.testing.assert_frame_equal(df_a, df_b)
