"""Buildvg test-data fetch helpers (reference constructVG.py:40-134) —
network mocked; verifies URLs, atomicity and decompression."""

import gzip
import io
import urllib.request

import pytest

from grafimo_tpu.errors import DependencyError
from grafimo_tpu.utils import fetch


def test_hg38_fetch_and_decompress(tmp_path, monkeypatch):
    fasta = b">chr1\nACGTACGT\n"
    seen = {}

    def fake_urlopen(url):
        seen["url"] = url
        return io.BytesIO(gzip.compress(fasta))

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    out = fetch.get_reference_genome_from_ucsc(str(tmp_path))
    assert seen["url"] == fetch.HG38_URL
    assert out.endswith("hg38.fa")
    assert open(out, "rb").read() == fasta
    assert not (tmp_path / "hg38.fa.gz").exists()  # cleaned up
    # idempotent: second call returns without re-downloading
    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda url: (_ for _ in ()).throw(AssertionError("re-download")),
    )
    assert fetch.get_reference_genome_from_ucsc(str(tmp_path)) == out


def test_1kgp_vcf_fetch(tmp_path, monkeypatch):
    body = b"##fileformat=VCFv4.2\n"
    monkeypatch.setattr(
        urllib.request, "urlopen", lambda url: io.BytesIO(body)
    )
    out = fetch.get_1000GProject_vcf(str(tmp_path))
    assert out.endswith(
        "ALL.wgs.shapeit2_integrated_snvindels_v2a.GRCh38.27022019."
        "sites.vcf.gz"
    )
    assert open(out, "rb").read() == body


def test_fetch_failure_leaves_no_debris(tmp_path, monkeypatch):
    def boom(url):
        raise OSError("no route to host")

    monkeypatch.setattr(urllib.request, "urlopen", boom)
    with pytest.raises(DependencyError, match="download of"):
        fetch.get_1000GProject_vcf(str(tmp_path))
    assert list(tmp_path.iterdir()) == []
