"""Measure the resident one-hot strided kernel (slice + conv, no
per-dispatch decode) against the word-decode strided kernel, both with
the production compressed histogram.  Also times the one-time
onehot_genome decode.

Run manually (never concurrently with another TPU process):

    timeout 1800 python tools/bench_onehot.py
"""

import json
import os
import sys
import time

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
        nplane_genome,
        onehot_genome,
        pwms_to_conv_kernel,
        scan_runs_resident_onehot_topk,
        scan_runs_resident_strided_topk,
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
    genome4 = jax.device_put(bytes_to_words(packed_bytes))
    elems = B * noff * m
    lo0 = jnp.int32(173)
    results = {}

    # one-time decode cost
    t0 = time.perf_counter()
    goh = onehot_genome(genome4)
    np.asarray(goh[0])
    results["onehot_decode_64Mbp_s"] = time.perf_counter() - t0
    print(
        f"onehot_genome decode (64 Mbp): "
        f"{results['onehot_decode_64Mbp_s']:.3f}s "
        f"({goh.shape[0] * 8 / 1e9:.1f} GB HBM)",
        file=sys.stderr,
    )

    def timed(label, step, iters=12):
        out = step(0)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(i)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        per = (time.perf_counter() - t0) / iters
        print(
            f"{label:44s} {per * 1e3:9.2f} ms/iter  "
            f"{elems / per / 1e9:8.2f} G elem/s",
            file=sys.stderr,
        )
        return per

    state = {"h": jnp.zeros((comp_size, m), jnp.int32)}

    def word_step(i):
        h, hb, nh, tv = scan_runs_resident_strided_topk(
            state["h"], genome4, None, lo0, None, pwm_dev, mins, cuts,
            B, stride, R, k, comp_size, 8192, hist_bases=bases_dev,
        )
        state["h"] = h
        return h

    results["strided_word_comp"] = timed(
        "strided kernel, word decode (comp hist)", word_step
    )
    sum_word = int(np.asarray(state["h"]).sum())

    state2 = {"h": jnp.zeros((comp_size, m), jnp.int32)}

    def oh_step(i):
        h, hb, nh, tv = scan_runs_resident_onehot_topk(
            state2["h"], goh, None, lo0, None, pwm_dev, mins, cuts,
            B, stride, R, k, comp_size, 8192, hist_bases=bases_dev,
        )
        state2["h"] = h
        return h

    results["strided_onehot_comp"] = timed(
        "strided kernel, RESIDENT ONE-HOT (comp)", oh_step
    )
    sum_oh = int(np.asarray(state2["h"]).sum())
    assert sum_word == sum_oh, (sum_word, sum_oh)
    print(f"checksums match: {sum_oh}", file=sys.stderr)
    print(json.dumps({
        "device": dev.device_kind,
        "elems_per_dispatch": elems,
        "per_iter_s": results,
    }))


if __name__ == "__main__":
    main()
