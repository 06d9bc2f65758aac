"""Differential test: run-compressed extraction vs the per-window
enumerator.

The per-window enumerator is oracle-validated against the reference's
``expected_seqs.tsv``; the run decomposition must produce the *identical*
window multiset — sequences, coordinates, node paths, ref flags and
haplotype frequencies — on the toy graph and on randomized graphs with
SNPs, insertions, deletions and multiallelic sites.
"""

import numpy as np
import pytest

from grafimo_tpu.graph.enumerate import enumerate_region_windows
from grafimo_tpu.graph.runs import expand_all_windows, region_runs
from grafimo_tpu.graph.sitegraph import build_graph
from grafimo_tpu.io.fasta import read_fasta
from grafimo_tpu.io.vcf import VcfRecord, iter_vcf_records


def window_key(w):
    return (w.begin, w.end, w.seq, tuple(w.path), w.is_ref, w.freq)


def assert_same_windows(graph, rs, re_, k):
    direct = sorted(
        window_key(w) for w in enumerate_region_windows(graph, rs, re_, k)
    )
    runs = region_runs(graph, rs, re_, k)
    from_runs = sorted(
        window_key(w) for w in expand_all_windows(graph, runs, k)
    )
    assert from_runs == direct


def test_toy_graph_runs_match_enumerator(input_dir):
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    graph = build_graph("x", seqs["x"], records)
    for rs, re_, k in [(0, 20, 19), (0, 50, 19), (5, 45, 7), (0, 50, 4)]:
        assert_same_windows(graph, rs, re_, k)


def _random_graph(rng, length=400, n_var=12, n_samples=3):
    seq = "".join(rng.choice(list("ACGT"), length))
    positions = sorted(
        rng.choice(np.arange(2, length - 10), size=n_var, replace=False)
    )
    records = []
    last_end = 0
    for pos0 in positions:
        pos0 = int(pos0)
        if pos0 < last_end:
            continue
        kind = rng.choice(["snp", "ins", "del", "multi"])
        ref1 = seq[pos0]
        if kind == "snp":
            alts = [rng.choice([c for c in "ACGT" if c != ref1])]
            ref = ref1
        elif kind == "ins":
            ins = "".join(rng.choice(list("ACGT"), rng.integers(1, 4)))
            ref = ref1
            alts = [ref1 + ins]
        elif kind == "del":
            dlen = int(rng.integers(1, 4))
            if pos0 + 1 + dlen > length:
                continue
            ref = seq[pos0 : pos0 + 1 + dlen]
            alts = [ref1]
        else:  # multiallelic SNP
            others = [c for c in "ACGT" if c != ref1]
            alts = list(rng.choice(others, size=2, replace=False))
            ref = ref1
        gt = []
        for _ in range(2 * n_samples):
            gt.append(int(rng.integers(0, len(alts) + 1)))
        records.append(
            VcfRecord(chrom="r", pos=pos0 + 1, ref=ref, alts=alts, gt=gt)
        )
        last_end = pos0 + len(ref)
    return build_graph("r", seq, records)


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_random_graph_runs_match_enumerator(seed):
    rng = np.random.default_rng(seed)
    graph = _random_graph(rng)
    for rs, re_, k in [(0, 400, 11), (37, 285, 8), (100, 220, 15)]:
        assert_same_windows(graph, rs, re_, k)


def _dense_snp_graph(n_snp=17, step=3, length=220, start=50):
    """A SNP chain whose FULL combination count (2^n_snp) is far beyond
    MAX_COMBOS_PER_CLUSTER — only the candidate DFS can enumerate it."""
    rng = np.random.default_rng(99)
    seq = "".join(rng.choice(list("ACGT"), length))
    records = []
    for i in range(n_snp):
        pos0 = start + i * step
        ref1 = seq[pos0]
        alt = rng.choice([c for c in "ACGT" if c != ref1])
        records.append(
            VcfRecord(
                chrom="r", pos=pos0 + 1, ref=ref1, alts=[alt],
                gt=[int(rng.integers(0, 2)) for _ in range(6)],
            )
        )
    return build_graph("r", seq, records)


def test_candidate_combos_equals_filtered_full_enumeration():
    """The candidate DFS yields exactly the (idx, combo) pairs of the
    full mixed-radix enumeration that produce a run, in index order."""
    from grafimo_tpu.graph.runs import (
        _build_cluster_run,
        _combinations,
        candidate_combos,
        cluster_sites,
        nth_combination,
    )

    rng = np.random.default_rng(3)
    graph = _random_graph(rng, length=300, n_var=14)
    k = 11
    for cluster in cluster_sites(graph, 0, 300, k):
        cands = candidate_combos(cluster, k)
        idxs = [i for i, _ in cands]
        assert idxs == sorted(set(idxs)), "sorted, duplicate-free"
        for i, combo in cands:
            assert nth_combination(cluster, i) == combo
        cand_set = {tuple(c) for _, c in cands}
        for x_idx, combo in enumerate(_combinations(cluster)):
            r = _build_cluster_run(graph, cluster, combo, 0, 300, k)
            if r is not None:
                assert tuple(combo) in cand_set, (
                    f"pruned a contributing combo {combo}"
                )


def test_dense_snp_chain_runs_match_enumerator():
    """2^17 full combinations; the candidate DFS keeps region_runs exact
    and sub-second where the old full enumeration hit the fallback cap."""
    graph = _dense_snp_graph()
    k = 10
    runs = region_runs(graph, 0, 220, k)
    assert all(r.ref[0] != -2 for r in runs), (
        "dense SNP chain must not need the per-window fallback"
    )
    assert_same_windows(graph, 0, 220, k)


def test_run_compression_ratio(input_dir):
    """Runs must carry far fewer bytes than materialised windows."""
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    graph = build_graph("x", seqs["x"], records)
    k = 19
    runs = region_runs(graph, 0, 50, k)
    n_windows = sum(r.n_windows() for r in runs)
    run_bytes = sum(len(r) for r in runs)
    window_bytes = n_windows * k
    assert n_windows > 0
    assert run_bytes < window_bytes
