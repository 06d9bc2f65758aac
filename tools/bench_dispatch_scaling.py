"""Dispatch-size scaling of the production resident kernel: is there
fixed per-dispatch overhead worth amortising by raising
MAX_BASES_PER_DISPATCH on TPU?  Run alone, under timeout."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from grafimo_tpu.models.parse import load_motifs
    from grafimo_tpu.models.pvalue import PvalueLookup
    from grafimo_tpu.ops.score_jax import reverse_complement_pwm
    from grafimo_tpu.ops.score_runs import (
        pwms_to_conv_kernel,
        scan_runs_resident_topk,
    )
    from grafimo_tpu.utils.constants import UNIF

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    motif = load_motifs(
        os.path.join(here, "tests", "data", "input", "MA0139.1.meme"),
        UNIF, 0.1, False,
    )[0]
    k = motif.width
    hist_size = 1000 * k + 1
    kernel = pwms_to_conv_kernel(
        [motif.score_matrix, reverse_complement_pwm(motif.score_matrix)]
    )
    mins = jax.device_put(np.array([motif.min_score] * 2, dtype=np.int32))
    cutoff = PvalueLookup(motif.pval_table).score_cutoff(1e-4)
    cuts = jax.device_put(np.array([cutoff] * 2, dtype=np.int32))
    pwm_dev = jax.device_put(kernel)
    rng = np.random.default_rng(0)
    genome_codes = rng.integers(0, 4, 64_000_000).astype(np.uint8)
    quads = genome_codes.reshape(-1, 4)
    genome4 = jax.device_put(
        (
            quads[:, 0] | (quads[:, 1] << 2)
            | (quads[:, 2] << 4) | (quads[:, 3] << 6)
        ).astype(np.uint8)
    )
    for B, R in [(1024, 2048), (2048, 2048), (4096, 2048), (8192, 2048),
                 (2048, 8192)]:
        noff = R - k + 1
        gstart = jax.device_put(
            rng.integers(0, len(genome_codes) - R, B).astype(np.int32)
        )
        h = jnp.zeros((hist_size, 2), jnp.int32)
        h, hb, nh, tv = scan_runs_resident_topk(
            h, genome4, None, gstart, None, pwm_dev, mins, cuts,
            R, k, hist_size, 8192,
        )
        np.asarray(h).sum()
        iters = max(4, (2048 * 2048 * 12) // (B * R))
        t0 = time.perf_counter()
        for _ in range(iters):
            h, hb, nh, tv = scan_runs_resident_topk(
                h, genome4, None, gstart, None, pwm_dev, mins, cuts,
                R, k, hist_size, 8192,
            )
        cs = int(np.asarray(h).sum())
        dt = (time.perf_counter() - t0) / iters
        elems = B * noff * 2
        print(
            f"B={B:5d} R={R:5d}: {dt * 1e3:8.2f} ms/iter  "
            f"{elems / dt / 1e9:6.3f} G elem/s  ({iters} iters, cs={cs})",
            flush=True,
        )


if __name__ == "__main__":
    main()
