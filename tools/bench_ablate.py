"""Ablation timing of the production strided kernel: every variant runs
the SAME dispatch shape, so the ~1.2-2 ms per-dispatch tunnel floor
(tools: probe, round 3) cancels in the differences — unlike the
stage-in-isolation numbers in bench_hist2, which each carry the floor.

Variants (all compressed hist, lo128 Pallas, B=2048 R=2048 k=19 m=2):

  full         expand + conv + hist + hitbits + topk package
  no_package   expand + conv + hist + hitbits   (no _topk_package)
  no_hitbits   expand + conv + hist             (hist only)
  no_hist      expand + conv + hitbits + package (hist = zeros)
  conv_only    expand + conv -> scores.sum
  expand_only  expand -> codes.sum

Run manually (never concurrently with another TPU process):

    timeout 1800 python tools/bench_ablate.py
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
    from grafimo_tpu.ops import score_runs as sr
    from grafimo_tpu.utils.constants import UNIF

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    motif = load_motifs(
        os.path.join(here, "tests", "data", "input", "MA0139.1.meme"),
        UNIF, 0.1, False,
    )[0]
    k = motif.width
    kernel = sr.pwms_to_conv_kernel(
        [motif.score_matrix, reverse_complement_pwm(motif.score_matrix)]
    )
    m = 2
    mins = jax.device_put(np.array([motif.min_score] * m, dtype=np.int32))
    cutoff = PvalueLookup(motif.pval_table).score_cutoff(1e-4)
    cuts = jax.device_put(np.array([cutoff] * m, dtype=np.int32))
    pwm_dev = jax.device_put(kernel)
    bases_np = kernel.min(axis=1).sum(axis=0).astype(np.int64)
    tops_np = kernel.max(axis=1).sum(axis=0).astype(np.int64)
    comp_size = int((tops_np - bases_np).max()) + 2
    bases_dev = jax.device_put(bases_np.astype(np.int32))

    B, R = 2048, 2048
    stride = R - k + 1
    noff = stride
    rng = np.random.default_rng(0)
    genome_codes = rng.integers(0, 4, 64_000_000).astype(np.uint8)
    quads = genome_codes[: len(genome_codes) // 4 * 4].reshape(-1, 4)
    packed_bytes = (
        quads[:, 0] | (quads[:, 1] << 2) | (quads[:, 2] << 4)
        | (quads[:, 3] << 6)
    ).astype(np.uint8)
    g32 = jax.device_put(sr.bytes_to_words(packed_bytes))
    lo0 = jnp.int32(173)
    elems = B * noff * m

    def timed(label, step, iters=12):
        out = step(0)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(i)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        per = (time.perf_counter() - t0) / iters
        print(
            f"{label:28s} {per * 1e3:8.2f} ms/iter "
            f"{elems / per / 1e9:7.2f} G ws/s",
            file=sys.stderr,
        )
        return per

    def scores_of(lo):
        codes = sr._expand_strided(g32, lo, B, stride, R, 2)
        return sr._window_scores(codes, pwm_dev, k)

    def hist_of(scores):
        h = jnp.where(
            scores < 0, jnp.int32(-1),
            jnp.maximum(scores - bases_dev[None, None, :] + 1, 0),
        )
        return sr._exact_hist(h, comp_size)

    def hitbits_of(scores):
        hit = (scores >= cuts[None, None, :]) & (scores >= 0)
        pad = (-noff) % 8
        hit = jnp.pad(hit, ((0, 0), (0, pad), (0, 0)))
        hit = hit.reshape(B, -1, 8, m).astype(jnp.uint8)
        w = (1 << jnp.arange(8, dtype=jnp.uint8))[None, None, :, None]
        return jnp.sum(hit * w, axis=2).astype(jnp.uint8)

    # every variant's return value DEPENDS on every stage it claims to
    # run — a variant returning only the histogram lets XLA dead-code-
    # eliminate the packaging entirely (first version of this tool)
    variants = {}

    @jax.jit
    def full(acc, lo):
        s = scores_of(lo)
        hist = hist_of(s)
        hb = hitbits_of(s)
        h2, hb2, nh, tv = sr._topk_package(acc, hist, hb, noff, m, 8192)
        return h2.at[0, 0].add(nh + tv.sum() + hb2.sum().astype(jnp.int32))

    variants["full"] = full

    @jax.jit
    def no_package(acc, lo):
        s = scores_of(lo)
        return (acc + hist_of(s)).at[0, 0].add(
            hitbits_of(s).sum().astype(jnp.int32)
        )

    variants["no_package"] = no_package

    @jax.jit
    def no_hitbits(acc, lo):
        return acc + hist_of(scores_of(lo))

    variants["no_hitbits"] = no_hitbits

    @jax.jit
    def no_hist(acc, lo):
        s = scores_of(lo)
        hb = hitbits_of(s)
        hist = jnp.zeros((comp_size, m), jnp.int32)
        h2, hb2, nh, tv = sr._topk_package(acc, hist, hb, noff, m, 8192)
        return h2.at[0, 0].add(nh + tv.sum() + hb2.sum().astype(jnp.int32))

    variants["no_hist"] = no_hist

    @jax.jit
    def conv_only(acc, lo):
        return acc.at[0, 0].add(
            scores_of(lo).sum().astype(jnp.int32)
        )

    variants["conv_only"] = conv_only

    @jax.jit
    def expand_only(acc, lo):
        c = sr._expand_strided(g32, lo, B, stride, R, 2)
        return acc.at[0, 0].add(c.sum().astype(jnp.int32))

    variants["expand_only"] = expand_only

    results = {}
    for name, fn in variants.items():
        st = {"a": jnp.zeros((comp_size, m), jnp.int32)}

        def step(i, fn=fn, st=st):
            st["a"] = fn(st["a"], lo0)
            return st["a"]

        results[name] = timed(name, step)

    print(json.dumps({
        "device": dev.device_kind,
        "elems_per_dispatch": elems,
        "per_iter_s": results,
    }))


if __name__ == "__main__":
    main()
