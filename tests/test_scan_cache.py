"""Scan checkpoint/resume: cached device batches must give identical
reports, and edited graphs must invalidate the cache."""

import os

import pandas as pd

from grafimo_tpu.cli import main


def _run(input_dir, tmp_path, outname, cache_dir):
    outdir = tmp_path / outname
    rc = main(
        [
            "findmotif",
            "-d", str(tmp_path / "graphs"),
            "-b", str(tmp_path / "regions.bed"),
            "-m", str(input_dir / "MA0139.1.meme"),
            "-t", "1", "--recomb",
            "--cache-dir", str(cache_dir),
            "-o", str(outdir),
            "--verbose",
        ]
    )
    assert rc == 0
    return pd.read_csv(outdir / "grafimo_out.tsv", sep="\t", index_col=0)


def test_cache_roundtrip(input_dir, tmp_path, capsys):
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
    (tmp_path / "regions.bed").write_text("chrx\t0\t50\n")
    cache_dir = tmp_path / "cache"
    df1 = _run(input_dir, tmp_path, "out1", cache_dir)
    out1 = capsys.readouterr().out
    assert "wrote scan checkpoint" in out1
    files = os.listdir(cache_dir)
    assert len(files) == 1
    df2 = _run(input_dir, tmp_path, "out2", cache_dir)
    out2 = capsys.readouterr().out
    assert "loaded scan checkpoint" in out2
    pd.testing.assert_frame_equal(df1, df2, check_exact=True)
    # rebuilding the graph (new mtime) invalidates the key
    os.utime(graph_dir / "x.gvt.npz")
    _run(input_dir, tmp_path, "out3", cache_dir)
    assert len(os.listdir(cache_dir)) == 2
