"""Reproduce one width pass of tools/bench_jaspar_ladder.py exactly
(same RNG stream: synth_meme first, then genome/variants), to isolate
the width-11 device/host mismatch.

    timeout 3600 python -u tools/repro_ladder_width.py [width] [mbp]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 11
    mbp = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    n_motifs = 800
    L = int(mbp * 1_000_000)
    H = 5096
    rng = np.random.default_rng(0)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from grafimo_tpu.ops.device import start_device_warmup

    start_device_warmup()

    from tools.bench_jaspar_ladder import synth_meme

    from grafimo_tpu.graph.sitegraph import build_graph
    from grafimo_tpu.io.vcf import VcfRecord
    from grafimo_tpu.models.parse import load_motifs
    from grafimo_tpu.runscan import build_region_runs, compute_results_runs
    from grafimo_tpu.utils.constants import UNIF

    meme_path = "/tmp/jaspar_core_like.meme"
    synth_meme(meme_path, n_motifs, rng)
    motifs = load_motifs(meme_path, UNIF, 0.1, False)

    t0 = time.perf_counter()
    seq = rng.integers(0, 4, L).astype(np.uint8).tobytes().translate(
        bytes.maketrans(bytes(range(4)), b"ACGT")
    ).decode()
    positions = np.sort(
        rng.choice(np.arange(1, L - 10), L // 30, replace=False)
    )
    keep = np.ones(len(positions), bool)
    keep[1:] = np.diff(positions) > 0
    positions = positions[keep]
    gt_all = (rng.integers(0, 7, (len(positions), H)) == 0).astype(
        np.int32
    )
    records = [
        VcfRecord(
            "c", int(p) + 1, seq[p],
            ["ACGT"[("ACGT".index(seq[p]) + 1) % 4]], gt_all[i],
        )
        for i, p in enumerate(positions)
    ]
    graph = build_graph("c", seq, records)
    print(
        f"graph: {len(records)} variants, "
        f"{time.perf_counter() - t0:.1f}s", file=sys.stderr,
    )

    ms = [mo for mo in motifs if mo.width == width]
    print(f"width {width}: {len(ms)} motifs", file=sys.stderr)
    rr = build_region_runs(graph, "c", [(0, L)], width)
    try:
        dfs = compute_results_runs(
            ms, rr, threshold=1e-6, recomb=False, verbose=True
        )
        print("OK:", sum(len(d) for d in dfs.values()), "hits")
    except RuntimeError as e:
        print("MISMATCH:", e)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
