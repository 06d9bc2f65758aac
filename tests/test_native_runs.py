"""Differential test: C++ run builder vs the python reference builder."""

import numpy as np
import pytest

from grafimo_tpu.graph.runs import region_runs
from grafimo_tpu.graph.sitegraph import build_graph
from grafimo_tpu.io.fasta import read_fasta
from grafimo_tpu.io.vcf import iter_vcf_records

native = pytest.importorskip("grafimo_tpu.native")
try:
    native._lib()
except Exception as _e:  # pragma: no cover - env without g++/native
    pytest.skip(f"native engine unavailable: {_e}", allow_module_level=True)


def _codes_of(run):
    lut = np.full(256, 4, dtype=np.uint8)
    for i, ch in enumerate("ACGT"):
        lut[ord(ch)] = i
    return lut[np.frombuffer(run.seq.encode("ascii"), np.uint8)]


def assert_native_matches(graph, rs, re_, k):
    py_runs = region_runs(graph, rs, re_, k)
    cc = native.build_region_runs_native(graph, rs, re_, k)
    assert len(cc) == len(py_runs)
    for pr, cr in zip(py_runs, cc):
        assert cr.ref == pr.ref
        np.testing.assert_array_equal(cr.codes, _codes_of(pr))
        np.testing.assert_array_equal(cr.valid, pr.valid)


def test_native_toy_graph(input_dir):
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    graph = build_graph("x", seqs["x"], records)
    for rs, re_, k in [(0, 20, 19), (0, 50, 19), (5, 45, 7), (0, 50, 4)]:
        assert_native_matches(graph, rs, re_, k)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5, 6, 7])
def test_native_random_graphs(seed):
    from tests.test_runs_differential import _random_graph

    rng = np.random.default_rng(seed)
    graph = _random_graph(rng, length=600, n_var=20, n_samples=4)
    for rs, re_, k in [(0, 600, 12), (55, 480, 9), (200, 340, 17)]:
        assert_native_matches(graph, rs, re_, k)


def test_native_runs_through_scan(input_dir):
    """End-to-end: the run-scan engine with native payloads must equal the
    python-payload result."""
    import pandas as pd

    from grafimo_tpu.models.parse import load_motifs
    from grafimo_tpu.runscan import build_region_runs, compute_results_runs
    from grafimo_tpu.utils.constants import UNIF

    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    graph = build_graph("x", seqs["x"], records)
    motif = load_motifs(str(input_dir / "MA0139.1.meme"), UNIF, 0.1, False)[0]
    rr = build_region_runs(graph, "x", [(0, 50)], 19)
    # ensure the native path actually produced the payloads
    assert all(not r._run_cache for r in rr)
    got = compute_results_runs([motif], rr, threshold=1.0, recomb=True)[
        motif.motif_id
    ]
    assert len(got) > 0
