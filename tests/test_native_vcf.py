"""Differential tests: C++ VCF scanner (native/vcfio.cpp) vs the python
reader (io/vcf.py) — records, haplotype bitsets, and end-to-end graphs must
be bit-identical across plain / gzip / BGZF containers."""

import gzip
import random
import struct
import zlib

import numpy as np
import pytest

from grafimo_tpu.graph.sitegraph import build_graph
from grafimo_tpu.io.vcf import iter_vcf_records, read_vcf_records

native = pytest.importorskip("grafimo_tpu.native")
try:
    native._lib()
except Exception as _e:  # pragma: no cover - env without g++/native
    pytest.skip(f"native engine unavailable: {_e}", allow_module_level=True)


TRICKY_VCF = """##fileformat=VCFv4.2
##contig=<ID=chr1>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3
chr1\t5\trs1\tA\tG\t.\tPASS\t.\tGT\t0|1\t1|1\t0|0
chr1\t10\trs2\tac\tt,AGG\t.\tPASS\t.\tGT:DP\t0|2:10\t2|1:3\t.|0:2
chr1\t15\trs3\tC\t.\t.\tPASS\t.\tGT\t0|0\t0|0\t0|0
chr1\t20\trs4\tT\t<DEL>\t.\tPASS\t.\tGT\t0|1\t0|0\t0|0
chr2\t7\trs5\tG\tC\t.\tPASS\t.\tGT\t1|1\t0|0\t0|1
chr1\t30\trs6\tGGG\tG,GA,GAAAAAA,GT,GC,GG,GCC,GTT,GAT,GAC,GTA,GCA\t.\tPASS\t.\tGT\t12|0\t3|12\t0|0
chr1\t40\trs7\tA\tC\t.\tPASS\t.\tGT\t.\t0/1\t1
chr1\t50\trs8\tG\tT\t.\tPASS\t.\tGT\t0/0\t0|0\t0|0
"""


def _bgzf(data: bytes, blk: int = 61) -> bytes:
    """Minimal BGZF writer (tiny blocks exercise line straddling)."""
    out = bytearray()
    chunks = [data[i : i + blk] for i in range(0, len(data), blk)] + [b""]
    for chunk in chunks:
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cd = co.compress(chunk) + co.flush()
        bsize = len(cd) + 25
        out += (
            b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
            + struct.pack("<H", 6)
            + b"BC"
            + struct.pack("<H", 2)
            + struct.pack("<H", bsize)
            + cd
            + struct.pack("<I", zlib.crc32(chunk))
            + struct.pack("<I", len(chunk))
        )
    return bytes(out)


def _expected_carriers(gt_list, n_hap):
    """HaploIndex-layout bitsets from a python allele-per-haplotype list."""
    arr = np.asarray(gt_list, dtype=np.int32)
    words = (n_hap + 63) // 64
    out = {}
    for al in np.unique(arr[arr > 0]).tolist():
        by = np.packbits(arr == al, bitorder="little")
        w = np.zeros(words * 8, dtype=np.uint8)
        w[: len(by)] = by
        out[int(al)] = w.view(np.uint64)
    return out


def _assert_scan_matches(path, chrom, tmp_path):
    py = list(iter_vcf_records(path, chrom))
    nat, n_hap = native.vcf_scan_native(path, chrom)
    assert len(nat) == len(py)
    for a, b in zip(py, nat):
        assert (a.chrom, a.pos, a.ref, a.alts) == (
            b.chrom, b.pos, b.ref, b.alts,
        )
        if a.gt is None:
            assert not b.gt
            continue
        want = _expected_carriers(a.gt, n_hap)
        got = {k: v[: (n_hap + 63) // 64] for k, v in b.gt.items()}
        assert sorted(want) == sorted(got)
        for k in want:
            np.testing.assert_array_equal(want[k], got[k])
    return nat, n_hap


@pytest.mark.parametrize("container", ["plain", "gzip", "bgzf"])
def test_tricky_vcf_all_containers(tmp_path, container):
    data = TRICKY_VCF.encode()
    if container == "plain":
        path = tmp_path / "t.vcf"
        path.write_bytes(data)
    elif container == "gzip":
        path = tmp_path / "t.vcf.gz"
        path.write_bytes(gzip.compress(data))
    else:
        path = tmp_path / "t.vcf.bgz"
        path.write_bytes(_bgzf(data))
    for chrom in ("chr1", "chr2", "chrZ"):
        _assert_scan_matches(str(path), chrom, tmp_path)


def test_toy_fixture_graph_identical(input_dir, tmp_path):
    """End-to-end: graphs built from native vs python records match."""
    from grafimo_tpu.io.fasta import read_fasta

    vcf = str(input_dir / "test.vcf.gz")
    seqs = read_fasta(str(input_dir / "test.fa"))
    for chrom in seqs:
        py = list(iter_vcf_records(vcf, chrom))
        nat, n_hap = native.vcf_scan_native(vcf, chrom)
        g_py = build_graph(chrom, seqs[chrom], py)
        g_nat = build_graph(chrom, seqs[chrom], nat, n_hap=n_hap)
        assert g_py.node_seqs == g_nat.node_seqs
        assert [
            (s.ref_start, s.ref_end, s.alleles, s.allele_nodes)
            for s in g_py.sites
        ] == [
            (s.ref_start, s.ref_end, s.alleles, s.allele_nodes)
            for s in g_nat.sites
        ]
        if g_py.haplo is None:
            assert g_nat.haplo is None
            continue
        assert g_py.haplo.n_hap == g_nat.haplo.n_hap
        assert g_py.haplo.site_allele_rows == g_nat.haplo.site_allele_rows
        np.testing.assert_array_equal(
            g_py.haplo.alt_bits, g_nat.haplo.alt_bits
        )


def test_random_fuzz_bgzf(tmp_path):
    """Randomized records across BGZF block boundaries."""
    rng = random.Random(7)
    n_samples = 13
    hdr = (
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
        "\tINFO\tFORMAT\t" + "\t".join(f"S{i}" for i in range(n_samples))
        + "\n"
    )
    rows = []
    pos = 10
    for _ in range(300):
        pos += rng.randint(1, 30)
        ref = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 4)))
        n_alt = rng.randint(1, 3)
        alts = ",".join(
            "".join(rng.choice("acgtACGT") for _ in range(rng.randint(1, 5)))
            for _ in range(n_alt)
        )
        cells = "\t".join(
            f"{rng.randint(0, n_alt)}{rng.choice('|/')}"
            f"{rng.choice(['.', str(rng.randint(0, n_alt))])}"
            + rng.choice(["", ":7", ":0,1"])
            for _ in range(n_samples)
        )
        rows.append(f"c7\t{pos}\t.\t{ref}\t{alts}\t.\t.\t.\tGT:X\t{cells}")
    data = (hdr + "\n".join(rows) + "\n").encode()
    path = tmp_path / "fz.vcf.bgz"
    path.write_bytes(_bgzf(data, blk=97))
    _assert_scan_matches(str(path), "c7", tmp_path)


def test_read_vcf_records_dispatch(tmp_path):
    """The io-level entry point returns native results when available."""
    path = tmp_path / "d.vcf"
    path.write_bytes(TRICKY_VCF.encode())
    records, n_hap = read_vcf_records(str(path), "chr1")
    assert n_hap == 6
    assert [r.pos for r in records] == [5, 10, 30, 40, 50]
    assert isinstance(records[0].gt, dict)


def test_truncated_gzip_raises(tmp_path):
    """A truncated gzip stream must never yield a silent partial read —
    the native scan errors and the fallback raises EOFError like the
    python reader."""
    vcf = (
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
        "\tINFO\tFORMAT\tS1\n"
        + "".join(
            f"chr1\t{p}\t.\tA\tG\t.\t.\t.\tGT\t0|1\n"
            for p in range(10, 5000, 7)
        )
    )
    full = gzip.compress(vcf.encode())
    path = tmp_path / "trunc.vcf.gz"
    path.write_bytes(full[: len(full) // 2])
    with pytest.raises(Exception):
        native.vcf_scan_native(str(path), "chr1")
    with pytest.raises(EOFError):
        read_vcf_records(str(path), "chr1")


def test_no_samples_vcf(tmp_path):
    data = (
        "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER"
        "\tINFO\nq\t4\t.\tA\tT\t.\t.\t.\nq\t9\t.\tC\tG,GA\t.\t.\t.\n"
    ).encode()
    path = tmp_path / "ns.vcf"
    path.write_bytes(data)
    nat, n_hap = native.vcf_scan_native(str(path), "q")
    assert n_hap is None
    assert [(r.pos, r.ref, r.alts, r.gt) for r in nat] == [
        (4, "A", ["T"], None),
        (9, "C", ["G", "GA"], None),
    ]
