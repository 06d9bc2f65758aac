"""Per-kernel-shape device timing at the ROUND-5 production shapes.

The 10 Mbp pocketed chromosome scan spent 852 s of device time on 23
slices (ops/score_runs kernels, compression off, XLA-dot histogram).
This tool dispatches each (kind, R, B) shape the scan actually used,
alone, in one process, with a value-fetch barrier — attributing the
wall to kernels instead of guessing (CLAUDE.md: attribute time ONLY
via same-shape ablations).

Usage: python tools/bench_dense_shapes.py [iters]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from grafimo_tpu.ops.device import start_device_warmup

start_device_warmup()

from grafimo_tpu.models.parse import load_motifs
from grafimo_tpu.ops.score_jax import reverse_complement_pwm
from grafimo_tpu.ops.score_runs import (
    bytes_to_words,
    pack_bits,
    pack_run_seqs,
    pwms_to_conv_kernel,
    scan_runs_device_topk,
    scan_runs_resident_patched_topk,
    scan_runs_resident_spliced_topk,
    scan_runs_resident_strided_topk,
)
from grafimo_tpu.runscan import PATCH_SLOTS_SHORT, SCAN_TOPK
from grafimo_tpu.utils.constants import UNIF


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    motif = load_motifs(
        os.path.join(here, "tests", "data", "input", "MA0139.1.meme"),
        UNIF, 0.1, False,
    )[0]
    k = motif.width
    hist_size = 1000 * k + 1
    kern = pwms_to_conv_kernel(
        [motif.score_matrix, reverse_complement_pwm(motif.score_matrix)]
    )
    m = 2
    mins = jax.device_put(np.array([motif.min_score] * m, np.int32))
    cuts = jax.device_put(np.array([motif.min_score + 4000] * m, np.int32))
    bases = jax.device_put(np.zeros(m, np.int32))
    kern_d = jax.device_put(kern)
    rng = np.random.default_rng(0)
    L = 10_000_000
    genome = rng.integers(0, 4, L).astype(np.uint8)
    margin = np.zeros(2048 // 2 + 16, np.uint8)
    g4 = jax.device_put(
        bytes_to_words(
            np.concatenate([pack_run_seqs(genome[None, :])[0], margin])
        )
    )

    def run(label, fn, *args, **kw):
        times = []
        for it in range(iters):
            acc = jnp.zeros((hist_size, m), jnp.int32)
            t0 = time.perf_counter()
            out = fn(acc, *args, **kw)
            np.asarray(out[0])  # fetch barrier through the tunnel
            times.append(time.perf_counter() - t0)
        steady = min(times[1:]) if len(times) > 1 else times[0]
        print(
            f"{label:<28} compile+first {times[0]:7.2f}s  steady "
            f"{steady:7.3f}s  all={['%.2f' % t for t in times]}",
            flush=True,
        )
        return steady

    # ---- shapes from the 10 Mbp pocketed run (23 slices) -------------
    # patched R=64: 1.62 M rows -> 7 slices of B=262144
    B = 262144
    for R in (64, 128):
        noff = R - k + 1
        gs = jax.device_put(
            rng.integers(0, L - 4 * R, B).astype(np.int32)
        )
        vb = jax.device_put(
            pack_bits(rng.random((B, noff)) < 0.5)
        )
        pat = np.full((B, PATCH_SLOTS_SHORT), -1, np.int16)
        pat[:, 0] = (
            rng.integers(0, R, B) * 4 + rng.integers(0, 4, B)
        ).astype(np.int16)
        pat_d = jax.device_put(pat)
        run(
            f"patched R={R} B={B}",
            scan_runs_resident_patched_topk,
            g4, None, gs, pat_d, vb, kern_d, mins, cuts,
            R, k, hist_size, SCAN_TOPK, hist_bases=bases,
        )
        spl = np.full((B, 4), 0x7FFF, np.int16)
        spl[:, 0] = rng.integers(k, R - k, B).astype(np.int16)
        spl[:, 1] = rng.integers(-6, 7, B).astype(np.int16)
        spl_d = jax.device_put(spl)
        run(
            f"spliced R={R} B={B}",
            scan_runs_resident_spliced_topk,
            g4, None, gs, spl_d, pat_d, vb, kern_d, mins, cuts,
            R, k, hist_size, SCAN_TOPK, hist_bases=bases,
        )
        codes = rng.integers(0, 4, (B, R)).astype(np.uint8)
        pk = jax.device_put(pack_run_seqs(codes))
        run(
            f"packed  R={R} B={B}",
            scan_runs_device_topk,
            pk, None, vb, kern_d, mins, cuts,
            k, hist_size, SCAN_TOPK, hist_bases=bases,
        )
    # backbone strided R=2048 whole-region slices, vs the per-row
    # gather kernel on the SAME rows — the cost a mesh host paid while
    # the strided path was single-device-gated (VERDICT r4 weak #1)
    from grafimo_tpu.ops.score_runs import scan_runs_resident_topk

    R = 2048
    stride = R - k + 1
    rows = 4096
    t_str = run(
        f"strided R={R} rows={rows}",
        scan_runs_resident_strided_topk,
        g4, None, jnp.int32(0), None, kern_d, mins, cuts,
        rows, stride, R, k, hist_size, SCAN_TOPK, hist_bases=bases,
    )
    gs_bb = jax.device_put(
        (stride * np.arange(rows)).astype(np.int32)
    )
    t_res = run(
        f"gather  R={R} rows={rows}",
        scan_runs_resident_topk,
        g4, None, gs_bb, None, kern_d, mins, cuts,
        R, k, hist_size, SCAN_TOPK, hist_bases=bases,
    )
    print(
        f"strided vs gather fallback on identical rows: "
        f"{t_str:.3f}s vs {t_res:.3f}s ({t_res / t_str:.2f}x)"
    )


if __name__ == "__main__":
    main()
