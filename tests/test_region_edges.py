"""Region boundary edge cases: regions beyond the chromosome end, regions
smaller than the motif, empty results."""

import numpy as np
import pandas as pd
import pytest

from grafimo_tpu.graph.enumerate import enumerate_region_windows
from grafimo_tpu.graph.extract import extract_region
from grafimo_tpu.graph.sitegraph import build_graph
from grafimo_tpu.io.fasta import read_fasta
from grafimo_tpu.io.vcf import iter_vcf_records
from grafimo_tpu.runscan import build_region_runs, compute_results_runs
from grafimo_tpu.models.parse import load_motifs
from grafimo_tpu.utils.constants import UNIF


@pytest.fixture(scope="module")
def toy_graph(input_dir):
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    return build_graph("x", seqs["x"], records)


def test_region_beyond_chromosome_end(toy_graph):
    # chromosome is 50bp; a BED region may overshoot
    wins = list(enumerate_region_windows(toy_graph, 40, 500, 19))
    # begin >= 40 and 19 bases available only up to coord 50 -> none
    assert wins == []
    wins = list(enumerate_region_windows(toy_graph, 20, 500, 19))
    assert all(w.end <= 50 for w in wins)
    # run engine agrees
    from grafimo_tpu.graph.runs import expand_all_windows, region_runs

    rw = expand_all_windows(toy_graph, region_runs(toy_graph, 20, 500, 19), 19)
    assert sorted((w.begin, w.end, w.seq) for w in rw) == sorted(
        (w.begin, w.end, w.seq) for w in wins
    )


def test_region_smaller_than_motif(toy_graph):
    assert list(enumerate_region_windows(toy_graph, 0, 10, 19)) == []
    batch = extract_region(toy_graph, 0, 10, 19)
    assert len(batch) == 0


def test_region_entirely_outside(toy_graph):
    assert list(enumerate_region_windows(toy_graph, 200, 400, 19)) == []


def test_scan_with_no_windows(toy_graph, input_dir):
    motif = load_motifs(str(input_dir / "MA0139.1.meme"), UNIF, 0.1, False)[0]
    rr = build_region_runs(toy_graph, "x", [(0, 10)], 19)
    dfs = compute_results_runs([motif], rr, threshold=1.0, recomb=True)
    assert len(dfs[motif.motif_id]) == 0
