"""Single-chip scoring throughput benchmark.

Prints ONE JSON line: ``{"metric", "value", "unit", "vs_baseline"}``.

Metric: windows scored per second per chip — each "window" is one k-length
candidate sequence scored on BOTH strands (forward + reverse-complement PWM
in a single contraction) with the exact integer score histogram and
device-side hit thresholding included, and with fresh host batches streamed
to the device every iteration (the production pattern: the extractor feeds
packed code tensors from host RAM).

Baseline: the reference (GRAFIMO, PLOS Comp Bio 2021 data shipped in-repo,
see BASELINE.md) scans the CTCF x 3000-ENCODE-regions x 1KGP-pangenome
workload in 942.3 s at 16 threads; with ~9e5 bp of scanned sequence, both
strands and haplotype-distinct windows that is on the order of 5e3
windows/s/host end to end.  ``vs_baseline`` divides by that 5e3 figure.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    from grafimo_tpu.models.parse import load_motifs
    from grafimo_tpu.ops.pack import pack_codes
    from grafimo_tpu.ops.score_jax import (
        hist_size_for_width,
        pwms_to_flat,
        reverse_complement_pwm,
        score_and_histogram_packed,
    )
    from grafimo_tpu.utils.constants import UNIF

    dev = jax.devices()[0]
    motif = load_motifs(
        "tests/data/input/MA0139.1.meme", UNIF, 0.1, False
    )[0]
    k = motif.width
    pwm = pwms_to_flat(
        [motif.score_matrix, reverse_complement_pwm(motif.score_matrix)]
    )
    mins = np.array([motif.min_score] * 2, dtype=np.int32)
    hs = hist_size_for_width(k)

    B = 1 << 21  # windows per device batch
    iters = 16
    rng = np.random.default_rng(0)
    # pre-generate host batches in the extractor's streaming format (2-bit
    # packed codes + flag byte); streaming them each iteration keeps the
    # host->device transfer inside the timing
    host_batches = [
        pack_codes(rng.integers(0, 4, (B, k)).astype(np.uint8))
        for _ in range(4)
    ]

    def step(packed, flags):
        return score_and_histogram_packed(packed, flags, pwm, mins, k, hs)

    # warmup / compile
    s, h = step(*host_batches[0])
    jax.block_until_ready((s, h))

    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        s, h = step(*host_batches[i % len(host_batches)])
        outs.append(h)
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    windows_per_s = B * iters / dt
    baseline = 5e3  # reference windows/s/host at 16 threads (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "windows_scored_per_s_per_chip",
                "value": round(windows_per_s, 1),
                "unit": "windows/s",
                "vs_baseline": round(windows_per_s / baseline, 1),
            }
        )
    )
    print(
        f"# device={dev.device_kind} batch={B} iters={iters} "
        f"time={dt:.3f}s k={k} strands=2",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
