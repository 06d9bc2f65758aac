"""Measure the lax.cond-gated hit packaging (ops/score_runs._topk_package):
production slices are almost all hitless, so gating the rank/slot/scatter
stages behind ``n_hits > 0`` should excise the packaging cost from the
common case without touching the hitful path's results.

Times the full production resident kernel (compressed hist) in three
regimes: hitless (production cutoffs, random genome), ~1% rows hitful,
and every row hitful (cutoff 0).

Run manually (never concurrently with another TPU process):

    timeout 1800 python tools/bench_cond_package.py
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    os.environ["GRAFIMO_PALLAS_HIST"] = "bf16lo128"
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from grafimo_tpu.models.parse import load_motifs
    from grafimo_tpu.models.pvalue import PvalueLookup
    from grafimo_tpu.ops.score_jax import reverse_complement_pwm
    from grafimo_tpu.ops.score_runs import (
        bytes_to_words,
        pwms_to_conv_kernel,
        scan_runs_resident_topk,
    )
    from grafimo_tpu.utils.constants import UNIF

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    motif = load_motifs(
        os.path.join(here, "tests", "data", "input", "MA0139.1.meme"),
        UNIF, 0.1, False,
    )[0]
    k = motif.width
    kernel = pwms_to_conv_kernel(
        [motif.score_matrix, reverse_complement_pwm(motif.score_matrix)]
    )
    m = 2
    mins = jax.device_put(np.array([motif.min_score] * m, dtype=np.int32))
    cutoff = PvalueLookup(motif.pval_table).score_cutoff(1e-4)
    pwm_dev = jax.device_put(kernel)
    bases_np = kernel.min(axis=1).sum(axis=0).astype(np.int64)
    tops_np = kernel.max(axis=1).sum(axis=0).astype(np.int64)
    comp_size = int((tops_np - bases_np).max()) + 2
    bases_dev = jax.device_put(bases_np.astype(np.int32))

    B, R = 2048, 2048
    noff = R - k + 1
    rng = np.random.default_rng(0)
    genome_codes = rng.integers(0, 4, 64_000_000).astype(np.uint8)
    quads = genome_codes[: len(genome_codes) // 4 * 4].reshape(-1, 4)
    packed_bytes = (
        quads[:, 0] | (quads[:, 1] << 2) | (quads[:, 2] << 4)
        | (quads[:, 3] << 6)
    ).astype(np.uint8)
    genome4 = jax.device_put(bytes_to_words(packed_bytes))
    gstart = jax.device_put(
        rng.integers(0, len(genome_codes) - R, B).astype(np.int32)
    )
    elems = B * noff * m
    results = {}
    for label, cut_val in (
        ("hitless_p1e-4", cutoff),
        ("dense_every_window", 0),
    ):
        cuts = jax.device_put(np.array([cut_val] * m, dtype=np.int32))
        state = {"h": jnp.zeros((comp_size, m), jnp.int32)}

        def step(i):
            h, hb, nh, tv = scan_runs_resident_topk(
                state["h"], genome4, None, gstart, None, pwm_dev, mins,
                cuts, R, k, comp_size, 8192, hist_bases=bases_dev,
            )
            state["h"] = h
            return nh

        nh = step(0)
        print(f"{label}: n_hits={int(np.asarray(nh))}", file=sys.stderr)
        t0 = time.perf_counter()
        iters = 12
        for i in range(iters):
            out = step(i)
        np.asarray(out)
        per = (time.perf_counter() - t0) / iters
        print(
            f"full kernel comp ({label}): {per * 1e3:.2f} ms/iter  "
            f"{elems / per / 1e9:.2f} G elem/s",
            file=sys.stderr,
        )
        results[label] = per
    print(json.dumps({
        "device": dev.device_kind,
        "elems_per_dispatch": elems,
        "per_iter_s": results,
    }))


if __name__ == "__main__":
    main()
