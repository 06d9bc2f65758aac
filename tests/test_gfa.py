"""GFA v1 import/export round-trip (vg interoperability)."""

import numpy as np
import pytest

from grafimo_tpu.errors import GraphError
from grafimo_tpu.graph.enumerate import enumerate_region_windows
from grafimo_tpu.graph.gfa import gfa_to_sitegraph, sitegraph_to_gfa
from grafimo_tpu.graph.sitegraph import build_graph
from grafimo_tpu.io.fasta import read_fasta
from grafimo_tpu.io.vcf import iter_vcf_records


@pytest.fixture(scope="module")
def toy_graph(input_dir):
    seqs = read_fasta(str(input_dir / "test.fa"))
    records = list(iter_vcf_records(str(input_dir / "test.vcf.gz"), "x"))
    return build_graph("x", seqs["x"], records)


def _windows_no_freq(graph, rs, re_, k):
    return sorted(
        (w.begin, w.end, w.seq, tuple(w.path), w.is_ref)
        for w in enumerate_region_windows(graph, rs, re_, k)
    )


def _windows_full(graph, rs, re_, k):
    return sorted(
        (w.begin, w.end, w.seq, tuple(w.path), w.is_ref, w.freq)
        for w in enumerate_region_windows(graph, rs, re_, k)
    )


def test_gfa_roundtrip_toy(toy_graph, tmp_path):
    p = tmp_path / "x.gfa"
    sitegraph_to_gfa(toy_graph, str(p))
    text = p.read_text()
    assert text.startswith("H\tVN:Z:1.0")
    assert "P\tx\t" in text
    assert "W\tsample0\t0\tx\t" in text  # haplotype walks (GFA 1.1)
    g2 = gfa_to_sitegraph(str(p))
    assert g2.chrom == "x"
    assert g2.seq == toy_graph.seq
    assert g2.node_seqs == toy_graph.node_seqs
    assert [
        (s.ref_start, s.ref_end, s.alleles, s.allele_nodes)
        for s in g2.sites
    ] == [
        (s.ref_start, s.ref_end, s.alleles, s.allele_nodes)
        for s in toy_graph.sites
    ]
    # identical window enumeration INCLUDING haplotype frequencies (W
    # lines round-trip the haplotype index)
    assert g2.haplo is not None and g2.haplo.n_hap == 2
    assert _windows_full(g2, 0, 50, 19) == _windows_full(
        toy_graph, 0, 50, 19
    )
    # a 1.0-style export (no W lines) imports without haplotypes
    p0 = tmp_path / "x0.gfa"
    sitegraph_to_gfa(toy_graph, str(p0), include_haplotypes=False)
    g0 = gfa_to_sitegraph(str(p0))
    assert g0.haplo is None
    assert _windows_no_freq(g0, 0, 50, 19) == _windows_no_freq(
        toy_graph, 0, 50, 19
    )


def test_gfa_roundtrip_indels(tmp_path):
    from tests.test_runs_differential import _random_graph

    rng = np.random.default_rng(5)
    g = _random_graph(rng, length=300, n_var=10)
    p = tmp_path / "r.gfa"
    sitegraph_to_gfa(g, str(p))
    g2 = gfa_to_sitegraph(str(p))
    assert g2.node_seqs == g.node_seqs
    assert _windows_full(g2, 0, 300, 9) == _windows_full(g, 0, 300, 9)


def test_gfa_import_chopped_backbone(tmp_path):
    """vg chops reference nodes (default 32bp); sites anchored between
    chopped nodes must import correctly."""
    gfa = tmp_path / "chopped.gfa"
    gfa.write_text(
        "H\tVN:Z:1.0\n"
        "S\t1\tACGTACGT\n"
        "S\t2\tTTTT\n"
        "S\t3\tC\n"  # alt allele (SNP vs first base of node 4)
        "S\t4\tA\n"
        "S\t5\tGGGG\n"
        "L\t1\t+\t2\t+\t0M\n"
        "L\t2\t+\t3\t+\t0M\n"
        "L\t2\t+\t4\t+\t0M\n"
        "L\t3\t+\t5\t+\t0M\n"
        "L\t4\t+\t5\t+\t0M\n"
        "P\tz\t1+,2+,4+,5+\t*\n"
    )
    g = gfa_to_sitegraph(str(gfa))
    assert g.seq == "ACGTACGTTTTTAGGGG"
    assert len(g.sites) == 1
    assert g.sites[0].ref_start == 12 and g.sites[0].ref_end == 13
    assert g.sites[0].alleles == ["A", "C"]


def test_gfa_import_flattens_nested_bubbles(tmp_path):
    """A branching off-path subgraph (shared alt prefix, as vg construct
    emits for alts with common leading bases) imports as one site whose
    alleles are all snarl paths."""
    gfa = tmp_path / "nested.gfa"
    gfa.write_text(
        "H\tVN:Z:1.0\n"
        "S\t1\tAAAA\nS\t2\tC\nS\t3\tG\nS\t4\tT\nS\t5\tCCCC\n"
        "L\t1\t+\t2\t+\t0M\n"
        "L\t2\t+\t3\t+\t0M\n"
        "L\t2\t+\t4\t+\t0M\n"  # branch inside an off-path chain
        "L\t3\t+\t5\t+\t0M\n"
        "L\t4\t+\t5\t+\t0M\n"
        "P\tz\t1+,5+\t*\n"
    )
    g = gfa_to_sitegraph(str(gfa))
    assert g.seq == "AAAACCCC"
    assert len(g.sites) == 1
    site = g.sites[0]
    # pure insertion at coord 4 with two flattened snarl alleles
    assert (site.ref_start, site.ref_end) == (4, 4)
    assert sorted(site.alleles[1:]) == ["CG", "CT"]


def test_nested_bubble_walk_haplotypes(tmp_path):
    """W walks through a branching snarl genotype by chain footprint
    (alleles share their head node, so head matching would misassign)."""
    gfa = tmp_path / "nested_w.gfa"
    gfa.write_text(
        "H\tVN:Z:1.1\n"
        "S\t1\tAAAA\nS\t2\tC\nS\t3\tG\nS\t4\tT\nS\t5\tCCCC\n"
        "L\t1\t+\t2\t+\t0M\n"
        "L\t2\t+\t3\t+\t0M\n"
        "L\t2\t+\t4\t+\t0M\n"
        "L\t3\t+\t5\t+\t0M\n"
        "L\t4\t+\t5\t+\t0M\n"
        "P\tz\t1+,5+\t*\n"
        "W\ts1\t0\tz\t0\t9\t>1>2>3>5\n"  # takes CG
        "W\ts1\t1\tz\t0\t9\t>1>2>4>5\n"  # takes CT
        "W\ts2\t0\tz\t0\t8\t>1>5\n"      # reference
    )
    g = gfa_to_sitegraph(str(gfa))
    assert g.haplo is not None and g.haplo.n_hap == 3
    site = g.sites[0]
    by_allele = {
        site.alleles[a]: row
        for a, row in g.haplo.site_allele_rows[0].items()
    }
    # walk 0 carries CG, walk 1 carries CT, walk 2 neither
    def carriers(allele):
        row = by_allele[allele]
        return int(g.haplo.alt_bits[row][0])

    assert carriers("CG") == 0b001
    assert carriers("CT") == 0b010


def test_gfa_import_rejects_cycles_and_dead_ends_strict(tmp_path):
    cyc = tmp_path / "cyc.gfa"
    cyc.write_text(
        "S\t1\tAAAA\nS\t2\tC\nS\t3\tG\nS\t4\tCCCC\n"
        "L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\nL\t3\t+\t2\t+\t0M\n"
        "L\t3\t+\t4\t+\t0M\nL\t1\t+\t4\t+\t0M\n"
        "P\tz\t1+,4+\t*\n"
    )
    with pytest.raises(GraphError):
        gfa_to_sitegraph(str(cyc), strict=True)
    dead = tmp_path / "dead.gfa"
    dead.write_text(
        "S\t1\tAAAA\nS\t2\tC\nS\t3\tCCCC\n"
        "L\t1\t+\t2\t+\t0M\nL\t1\t+\t3\t+\t0M\n"
        "P\tz\t1+,3+\t*\n"
    )
    with pytest.raises(GraphError):
        gfa_to_sitegraph(str(dead), strict=True)


def test_gfa_unflattenable_snarl_degrades_per_site(tmp_path, capsys):
    """A cyclic snarl is skipped with a warning — the OTHER variant site
    on the chromosome still imports (per-region warn-and-continue, like
    failed scan regions)."""
    gfa = tmp_path / "mixed.gfa"
    gfa.write_text(
        "S\t1\tAAAA\nS\t2\tC\nS\t3\tG\nS\t4\tCCCC\nS\t5\tT\nS\t6\tGGGG\n"
        # snarl 1 (cyclic: 2 <-> 3) between backbone 1 and 4
        "L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\nL\t3\t+\t2\t+\t0M\n"
        "L\t3\t+\t4\t+\t0M\nL\t1\t+\t4\t+\t0M\n"
        # snarl 2 (clean insertion of T) between backbone 4 and 6
        "L\t4\t+\t5\t+\t0M\nL\t5\t+\t6\t+\t0M\nL\t4\t+\t6\t+\t0M\n"
        "P\tz\t1+,4+,6+\t*\n"
    )
    g = gfa_to_sitegraph(str(gfa))
    err = capsys.readouterr().err
    assert "WARNING" in err and "skipping variant site" in err
    assert g.seq == "AAAACCCCGGGG"
    assert len(g.sites) == 1  # the clean insertion survived
    assert g.sites[0].alleles[1:] == ["T"]


def _spell_all_paths(segments, succs, start, end):
    """Brute-force: every start->end path's concatenated sequence."""
    out = []
    stack = [(start, segments[start])]
    while stack:
        node, s = stack.pop()
        if node == end:
            out.append(s)
            continue
        for t in succs.get(node, []):
            stack.append((t, s + segments[t]))
    return sorted(out)


def _sitegraph_strings(g):
    """Every sequence the SiteGraph spells (all site-allele combos)."""
    import itertools

    spans = [(s.ref_start, s.ref_end, s.alleles) for s in g.sites]
    spans.sort()
    outs = []
    for combo in itertools.product(*(a for _s, _e, a in spans)):
        parts, pos = [], 0
        for (s, e, _a), allele in zip(spans, combo):
            parts.append(g.seq[pos:s])
            parts.append(allele)
            pos = e
        parts.append(g.seq[pos:])
        outs.append("".join(parts))
    return sorted(set(outs))


def test_gfa_fuzz_braided_snarls(tmp_path):
    """Randomized braided/nested snarls (layered DAGs between backbone
    anchors): the imported SiteGraph must spell EXACTLY the set of
    sequences the GFA spells (brute-force path oracle)."""
    rng = np.random.default_rng(123)
    bases = "ACGT"

    for trial in range(25):
        segments = {}
        links = []
        succs = {}

        def seg(seq):
            sid = str(len(segments) + 1)
            segments[sid] = seq
            return sid

        def link(u, v):
            links.append((u, v))
            succs.setdefault(u, []).append(v)

        def rand_seq(lo, hi):
            return "".join(
                rng.choice(list(bases))
                for _ in range(int(rng.integers(lo, hi + 1)))
            )

        n_sites = int(rng.integers(1, 4))
        backbone = [seg(rand_seq(4, 8)) for _ in range(n_sites + 1)]
        for i in range(n_sites):
            left, right = backbone[i], backbone[i + 1]
            link(left, right)  # ref side always present
            # braided snarl: 1-3 layers, 1-2 nodes each, dense edges
            layers = [
                [seg(rand_seq(1, 3)) for _ in range(int(rng.integers(1, 3)))]
                for _ in range(int(rng.integers(1, 4)))
            ]
            prev = [left]
            for layer in layers:
                for v in layer:
                    # every layer node gets >= 1 predecessor
                    for u in rng.choice(
                        prev, size=int(rng.integers(1, len(prev) + 1)),
                        replace=False,
                    ):
                        link(u, v)
                prev = layer
            for u in prev:
                link(u, right)
            # extra skip edges forward across layers (braiding)
            flat = [n for layer in layers for n in layer]
            for _ in range(int(rng.integers(0, 3))):
                a, b = rng.integers(0, len(flat), 2)
                if a < b and flat[b] not in succs.get(flat[a], []):
                    link(flat[a], flat[b])
            # no dead ends: an unchosen mid-layer node exits to `right`
            for n in flat:
                if n not in succs:
                    link(n, right)

        gfa = tmp_path / f"fuzz{trial}.gfa"
        lines = ["H\tVN:Z:1.0"]
        lines += [f"S\t{sid}\t{s}" for sid, s in segments.items()]
        lines += [f"L\t{u}\t+\t{v}\t+\t0M" for u, v in links]
        lines.append(
            "P\tz\t" + ",".join(f"{n}+" for n in backbone) + "\t*"
        )
        gfa.write_text("\n".join(lines) + "\n")

        g = gfa_to_sitegraph(str(gfa), strict=True)
        want = _spell_all_paths(
            segments, succs, backbone[0], backbone[-1]
        )
        got = _sitegraph_strings(g)
        assert got == sorted(set(want)), f"trial {trial} diverged"
