"""Minimal reproducer for the width-11 / m=224 device-host score
mismatch seen by tools/bench_jaspar_ladder.py (round 3).

Runs N same-width synthetic PWMs through the production
compute_results_runs on a small SNP pangenome and, on mismatch, dumps
the offending motif column: device histogram bins around the missing
score vs a host-recomputed histogram for that column.

    timeout 3600 python -u tools/repro_m224.py [n_motifs] [kbp] [width]
"""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    n_motifs = int(sys.argv[1]) if len(sys.argv) > 1 else 112
    kbp = float(sys.argv[2]) if len(sys.argv) > 2 else 1000.0
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 11

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from grafimo_tpu.ops.device import start_device_warmup

    start_device_warmup()

    from tools.bench_jaspar_ladder import WIDTH_PMF  # noqa: F401

    from grafimo_tpu.graph.sitegraph import build_graph
    from grafimo_tpu.io.vcf import VcfRecord
    from grafimo_tpu.models.parse import load_motifs
    from grafimo_tpu.runscan import build_region_runs, compute_results_runs
    from grafimo_tpu.utils.constants import UNIF

    rng = np.random.default_rng(0)
    # same synthesis as the ladder, pinned to one width
    lines = [
        "MEME version 4", "",
        "ALPHABET= ACGT", "",
        "strands: + -", "",
        "Background letter frequencies (from uniform background):",
        "A 0.25000 C 0.25000 G 0.25000 T 0.25000", "",
    ]
    for i in range(n_motifs):
        k = width
        nsites = int(rng.integers(20, 5000))
        lines.append(f"MOTIF M{i:04d} TF{i:04d}")
        lines.append(
            "letter-probability matrix: alength= 4 w= "
            f"{k} nsites= {nsites} E= 0"
        )
        for j in range(k):
            edge = min(j, k - 1 - j) / max(1, (k - 1) / 2)
            conc = 0.15 + 2.5 * edge
            p = rng.dirichlet([conc] * 4)
            p = np.maximum(p, 1e-4)
            p = p / p.sum()
            lines.append(" ".join(f"{x:.6f}" for x in p))
        lines.append("")
    meme = "/tmp/repro_m224.meme"
    with open(meme, "w") as fh:
        fh.write("\n".join(lines))
    motifs = load_motifs(meme, UNIF, 0.1, False)

    L = int(kbp * 1000)
    seq = rng.integers(0, 4, L).astype(np.uint8).tobytes().translate(
        bytes.maketrans(bytes(range(4)), b"ACGT")
    ).decode()
    positions = np.sort(
        rng.choice(np.arange(1, L - 10), L // 30, replace=False)
    )
    keep = np.ones(len(positions), bool)
    keep[1:] = np.diff(positions) > 0
    positions = positions[keep]
    H = 64
    records = [
        VcfRecord(
            "c", int(p) + 1, seq[p],
            ["ACGT"[("ACGT".index(seq[p]) + 1) % 4]],
            (rng.integers(0, 7, H) == 0).astype(np.int32),
        )
        for p in positions
    ]
    graph = build_graph("c", seq, records)
    k = width
    rr = build_region_runs(graph, "c", [(0, L)], k)
    try:
        dfs = compute_results_runs(
            motifs, rr, threshold=1e-6, recomb=False, verbose=False
        )
        print(
            "OK no mismatch:",
            sum(len(d) for d in dfs.values()), "hits",
        )
    except RuntimeError as e:
        print("MISMATCH:", e)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
