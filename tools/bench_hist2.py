"""Round-3 kernel probes: where do the production kernel's milliseconds
actually go, and do the v2 histogram formulations beat the XLA dot?

Stages timed (value-fetch barrier; see CLAUDE.md on block_until_ready):

* expand_resident alone (byte gather + shift_select)
* codes -> one-hot only
* one-hot -> NWC conv only (pre-expanded codes input)
* masks + hit packaging alone
* hist: XLA bf16 one-hot dot (production), Pallas v1 bf16,
  Pallas v2 bf16 (lo=128 radix + dtype-native compares), Pallas v2 int8
* full production kernel for reference

Run manually (never concurrently with another TPU process):

    timeout 2400 python tools/bench_hist2.py
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
    os.environ["GRAFIMO_PALLAS_HIST"] = "off"
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
    from grafimo_tpu.ops.pallas_hist import (
        hist_pallas,
        hist_pallas2,
        hist_pallas3,
    )
    from grafimo_tpu.ops.score_jax import reverse_complement_pwm
    from grafimo_tpu.ops.score_runs import (
        _exact_hist,
        _expand_resident,
        _window_scores,
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
    hist_size = 1000 * k + 1
    kernel = pwms_to_conv_kernel(
        [motif.score_matrix, reverse_complement_pwm(motif.score_matrix)]
    )
    m = 2
    mins = jax.device_put(np.array([motif.min_score] * m, dtype=np.int32))
    cutoff = PvalueLookup(motif.pval_table).score_cutoff(1e-4)
    cuts = jax.device_put(np.array([cutoff] * m, dtype=np.int32))
    pwm_dev = jax.device_put(kernel)

    from grafimo_tpu.ops.score_runs import bytes_to_words

    B, R = 2048, 2048
    noff = R - k + 1
    rng = np.random.default_rng(0)
    genome_codes = rng.integers(0, 4, 64_000_000).astype(np.uint8)
    quads = genome_codes[: len(genome_codes) // 4 * 4].reshape(-1, 4)
    packed_bytes = (
        quads[:, 0]
        | (quads[:, 1] << 2)
        | (quads[:, 2] << 4)
        | (quads[:, 3] << 6)
    ).astype(np.uint8)
    genome4 = jax.device_put(bytes_to_words(packed_bytes))
    gstart = jax.device_put(
        rng.integers(0, len(genome_codes) - R, B).astype(np.int32)
    )
    elems = B * noff * m

    def timed(label, step, iters=12):
        out = step(0)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(i)
        v = np.asarray(jax.tree_util.tree_leaves(out)[0])
        dt = time.perf_counter() - t0
        per = dt / iters
        print(
            f"{label:44s} {per * 1e3:9.2f} ms/iter  "
            f"{elems / per / 1e9:8.2f} G elem/s  checksum={int(np.sum(v))}",
            file=sys.stderr,
        )
        return per

    results = {}
    only_hist = "--only-hist" in sys.argv

    # --- expand alone ----------------------------------------------------
    @partial(jax.jit, static_argnames=("r",))
    def expand_only(g4, gs, r):
        return _expand_resident(g4, gs, r).sum()

    if only_hist:
        scores_host = rng.integers(
            -1, hist_size, (B, noff, m), dtype=np.int64
        ).astype(np.int32)
        scores_dev = jax.device_put(scores_host)
        for fn, label in (
            (partial(hist_pallas, use_int8=False, lo_w=128),
             "pallas_v1_lo128"),
            (partial(hist_pallas3, use_f32=False), "pallas_v3_bf16"),
            (partial(hist_pallas3, use_f32=True), "pallas_v3_f32"),
            (partial(hist_pallas3, use_f32=False, tile=8192),
             "pallas_v3_bf16_t8k"),
        ):
            st2 = {"a": jnp.zeros((hist_size, m), jnp.int32)}

            @partial(jax.jit, static_argnames=("hs",))
            def p_hist(acc, s, hs, fn=fn):
                return acc + fn(s, hs)

            def ph_step(i):
                st2["a"] = p_hist(st2["a"], scores_dev, hist_size)
                return st2["a"]

            try:
                results[f"hist_{label}"] = timed(f"hist: {label}", ph_step)
            except Exception as e:
                print(f"hist {label} FAILED: {e}", file=sys.stderr)
                results[f"hist_{label}"] = None
        print(json.dumps({
            "device": dev.device_kind,
            "elems_per_dispatch": elems,
            "per_iter_s": results,
        }, indent=2))
        return

    results["expand_only"] = timed(
        "expand_resident only (word gather + select)",
        lambda i: expand_only(genome4, gstart, R),
    )

    # --- strided expansion (gather-free) ------------------------------------
    from grafimo_tpu.ops.score_runs import _expand_strided

    stride = R - k + 1

    @partial(jax.jit, static_argnames=("b", "s", "r"))
    def expand_strided(g4, lo, b, s, r):
        return _expand_strided(g4, lo, b, s, r, 2).sum()

    lo0 = jnp.int32(173)
    results["expand_strided"] = timed(
        "expand strided (span decode, no gather)",
        lambda i: expand_strided(genome4, lo0, B, stride, R),
    )

    # --- conv from pre-expanded codes -------------------------------------
    codes_dev = jax.block_until_ready(
        jax.jit(_expand_resident, static_argnums=(2,))(genome4, gstart, R)
    )

    @partial(jax.jit, static_argnames=("kk",))
    def conv_pre(codes, pwm, kk):
        return _window_scores(codes, pwm, kk).sum()

    results["conv_from_codes"] = timed(
        "one-hot + NWC conv (pre-expanded codes)",
        lambda i: conv_pre(codes_dev, pwm_dev, k),
    )

    @jax.jit
    def onehot_only(codes):
        onehot = (
            codes[:, :, None]
            == jnp.arange(4, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)
        return onehot.sum()

    results["onehot_only"] = timed(
        "codes -> one-hot bf16 only",
        lambda i: onehot_only(codes_dev),
    )

    # --- hit packaging alone (scores precomputed) --------------------------
    scores_host = rng.integers(
        -1, hist_size, (B, noff, m), dtype=np.int64
    ).astype(np.int32)
    scores_dev = jax.device_put(scores_host)

    from grafimo_tpu.ops.score_runs import _topk_package

    @jax.jit
    def package_only(s, hist_acc):
        hit = (s >= cuts[None, None, :]) & (s >= 0)
        pad = (-noff) % 8
        hit = jnp.pad(hit, ((0, 0), (0, pad), (0, 0)))
        hit = hit.reshape(B, -1, 8, m).astype(jnp.uint8)
        weights = (1 << jnp.arange(8, dtype=jnp.uint8))[None, None, :, None]
        hitbits = jnp.sum(hit * weights, axis=2).astype(jnp.uint8)
        return _topk_package(hist_acc, jnp.zeros_like(hist_acc), hitbits,
                             noff, m, 4096)[3]

    hist_acc0 = jnp.zeros((hist_size, m), jnp.int32)
    results["package_only"] = timed(
        "hit bits + two-level compaction only",
        lambda i: package_only(scores_dev, hist_acc0),
    )

    # --- histogram variants over a resident scores tensor ------------------
    @partial(jax.jit, static_argnames=("hs",))
    def xla_hist(acc, s, hs):
        return acc + _exact_hist(s, hs)

    st = {"a": jnp.zeros((hist_size, m), jnp.int32)}

    def xh_step(i):
        st["a"] = xla_hist(st["a"], scores_dev, hist_size)
        return st["a"]

    results["hist_xla"] = timed("hist: XLA bf16 one-hot dot", xh_step)

    for fn, label in (
        (partial(hist_pallas, use_int8=False), "pallas_v1_bf16"),
        (partial(hist_pallas, use_int8=False, lo_w=128), "pallas_v1_lo128"),
        (partial(hist_pallas2, use_int8=False), "pallas_v2_bf16"),
        (partial(hist_pallas2, use_int8=True), "pallas_v2_int8"),
    ):
        st2 = {"a": jnp.zeros((hist_size, m), jnp.int32)}

        @partial(jax.jit, static_argnames=("hs",))
        def p_hist(acc, s, hs, fn=fn):
            return acc + fn(s, hs)

        def ph_step(i):
            st2["a"] = p_hist(st2["a"], scores_dev, hist_size)
            return st2["a"]

        try:
            results[f"hist_{label}"] = timed(f"hist: {label}", ph_step)
        except Exception as e:
            print(f"hist {label} FAILED: {e}", file=sys.stderr)
            results[f"hist_{label}"] = None

    # --- full strided kernel (production path for whole-region scans) -------
    from grafimo_tpu.ops.score_runs import scan_runs_resident_strided_topk

    os.environ["GRAFIMO_PALLAS_HIST"] = "bf16lo128"
    jax.clear_caches()
    state_s = {"h": jnp.zeros((hist_size, m), jnp.int32)}

    def strided_step(i):
        h, hb, nh, tv = scan_runs_resident_strided_topk(
            state_s["h"], genome4, None, lo0, None, pwm_dev, mins, cuts,
            B, stride, R, k, hist_size, 4096,
        )
        state_s["h"] = h
        return h

    results["full_strided_lo128"] = timed(
        "full kernel strided (lo128 hist)", strided_step
    )

    # --- full kernel with exact per-column hist compression (production
    # single-device path: scores only span [sum-min, sum-max] per column,
    # runscan passes hist_bases) --------------------------------------------
    bases_np = kernel.min(axis=1).sum(axis=0).astype(np.int64)
    tops_np = kernel.max(axis=1).sum(axis=0).astype(np.int64)
    comp_size = int((tops_np - bases_np).max()) + 2
    bases_dev = jax.device_put(bases_np.astype(np.int32))
    print(
        f"compressed hist: {comp_size} bins vs {hist_size} full "
        f"({comp_size / hist_size:.2f}x)",
        file=sys.stderr,
    )
    from grafimo_tpu.ops.score_runs import scan_runs_resident_topk as _srt

    for mode, label in (
        ("bf16lo128", "full_comp_pallas_lo128"),
        ("off", "full_comp_xla"),
    ):
        os.environ["GRAFIMO_PALLAS_HIST"] = mode
        jax.clear_caches()
        state_c = {"h": jnp.zeros((comp_size, m), jnp.int32)}

        def comp_step(i):
            h, hb, nh, tv = _srt(
                state_c["h"], genome4, None, gstart, None, pwm_dev, mins,
                cuts, R, k, comp_size, 4096, hist_bases=bases_dev,
            )
            state_c["h"] = h
            return h

        try:
            results[label] = timed(
                f"full kernel COMPRESSED ({mode} hist)", comp_step
            )
        except Exception as e:
            print(f"full comp {mode} FAILED: {e}", file=sys.stderr)
            results[label] = None

    # strided + compressed: the dominant whole-region production shape
    os.environ["GRAFIMO_PALLAS_HIST"] = "bf16lo128"
    jax.clear_caches()
    state_sc = {"h": jnp.zeros((comp_size, m), jnp.int32)}

    def strided_comp_step(i):
        h, hb, nh, tv = scan_runs_resident_strided_topk(
            state_sc["h"], genome4, None, lo0, None, pwm_dev, mins, cuts,
            B, stride, R, k, comp_size, 4096, hist_bases=bases_dev,
        )
        state_sc["h"] = h
        return h

    results["full_strided_comp_lo128"] = timed(
        "full kernel strided COMPRESSED (lo128)", strided_comp_step
    )

    # --- full production kernel, per hist backend ---------------------------
    checks = {}
    for mode, label in (
        ("off", "full_xla_hist"),
        ("bf16", "full_pallas_v1_bf16"),
        ("bf16lo128", "full_pallas_v1_lo128"),
        ("v2bf16", "full_pallas_v2_bf16"),
        ("v2int8", "full_pallas_v2_int8"),
    ):
        os.environ["GRAFIMO_PALLAS_HIST"] = mode
        jax.clear_caches()  # _pallas_hist_mode is read at trace time
        state = {"h": jnp.zeros((hist_size, m), jnp.int32)}

        def full_step(i):
            h, hb, nh, tv = scan_runs_resident_topk(
                state["h"], genome4, None, gstart, None, pwm_dev, mins,
                cuts, R, k, hist_size, 4096,
            )
            state["h"] = h
            return h

        try:
            results[label] = timed(f"full kernel ({mode} hist)", full_step)
            checks[label] = int(np.asarray(state["h"]).sum())
        except Exception as e:
            print(f"full kernel {mode} FAILED: {e}", file=sys.stderr)
            results[label] = None
    assert len({v for v in checks.values()}) <= 1, (
        f"hist backends disagree: {checks}"
    )

    report = {
        "device": dev.device_kind,
        "elems_per_dispatch": elems,
        "per_iter_s": results,
        "elem_per_s": {
            kk: (elems / v if v else None) for kk, v in results.items()
        },
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
