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


def test_rrr_vector_random_roundtrip():
    """The vectorized rrr_vector<63> decoder inverts a reference
    encoder over random bit vectors, including dense blocks that hit
    the forced-take branch (k > remaining positions) and all-ones
    blocks (class 63, zero offset bits)."""
    import struct as _struct
    from math import comb as _comb

    import numpy as np

    from grafimo_tpu.graph.gbwt import _Reader
    from grafimo_tpu.graph.xg import _RRR_SPACE, _rrr_vector

    rng = np.random.default_rng(42)
    for trial, density in enumerate((0.05, 0.5, 0.97)):
        m_size = int(rng.integers(1, 400))
        bits = rng.random(m_size) < density
        if trial == 2:
            bits[:63] = True  # force one all-ones block
        nb = (m_size + 62) // 63
        padded = np.zeros(nb * 63, dtype=bool)
        padded[:m_size] = bits
        bt = []
        stream = []  # (code, nbits)
        for b in range(nb):
            blk = padded[b * 63 : (b + 1) * 63]
            k = int(blk.sum())
            bt.append(k)
            if k in (0, 63):
                continue
            code = 0
            kk = k
            for i in range(63):
                if kk == 0:
                    break
                if blk[i]:
                    code += _comb(62 - i, kk)
                    kk -= 1
            stream.append((code, _RRR_SPACE[k]))
        # serialize: m_size, bt iv0(width 6), btnr bv, btnrp iv0 (empty-
        # ish), rank_samples iv0
        total_bits = sum(n for _c, n in stream)
        words = np.zeros((max(total_bits, 1) + 63) // 64, np.uint64)
        p = 0
        for code, n in stream:
            for j in range(n):
                if (code >> j) & 1:
                    words[(p + j) // 64] |= np.uint64(1) << np.uint64(
                        (p + j) % 64
                    )
            p += n
        def iv0(vals, width):
            n = len(vals)
            w = np.zeros((max(n * width, 1) + 63) // 64, np.uint64)
            for i, v in enumerate(vals):
                for j in range(width):
                    if (v >> j) & 1:
                        w[(i * width + j) // 64] |= np.uint64(1) << \
                            np.uint64((i * width + j) % 64)
            return (_struct.pack("<Q", n * width) + bytes([width])
                    + w.tobytes())
        blob = (
            _struct.pack("<Q", m_size)
            + iv0(bt, 6)
            + _struct.pack("<Q", total_bits) + words[
                : (total_bits + 63) // 64].tobytes()
            + iv0([0], 6)
            + iv0([0], 6)
        )
        pos, size = _rrr_vector(_Reader(blob))
        assert size == m_size
        np.testing.assert_array_equal(pos, np.flatnonzero(bits))
