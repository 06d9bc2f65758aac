"""Device-resident stage timings for the production run-scan kernel.

Measures, on the real chip with everything device-resident (one value
fetch as the timing barrier — ``block_until_ready`` lies through the TPU
tunnel):

* full production kernel (``scan_runs_resident_topk``), XLA histogram
* full production kernel, Pallas histogram (bf16 / int8 one-hot)
* histogram alone: XLA ``_exact_hist`` vs Pallas bf16 vs Pallas int8
* expand + conv alone (scores, no histogram / hit packaging)

Run manually (never concurrently with another TPU process):

    timeout 2400 python tools/bench_stages.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # first full-kernel measurement must be the XLA histogram (auto mode
    # would already pick Pallas on a single TPU device)
    os.environ["GRAFIMO_PALLAS_HIST"] = "off"
    import jax

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp
    from functools import partial

    from grafimo_tpu.models.parse import load_motifs
    from grafimo_tpu.models.pvalue import PvalueLookup
    from grafimo_tpu.ops.pallas_hist import hist_pallas
    from grafimo_tpu.ops.score_jax import reverse_complement_pwm
    from grafimo_tpu.ops.score_runs import (
        _exact_hist,
        _expand_resident,
        _score_codes,
        pack_bits,
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
    mins = jax.device_put(
        np.array([motif.min_score] * m, dtype=np.int32)
    )
    cutoff = PvalueLookup(motif.pval_table).score_cutoff(1e-4)
    cuts = jax.device_put(np.array([cutoff] * m, dtype=np.int32))
    pwm_dev = jax.device_put(kernel)

    B, R = 2048, 2048
    noff = R - k + 1
    rng = np.random.default_rng(0)
    genome_codes = rng.integers(0, 4, 64_000_000).astype(np.uint8)
    quads = genome_codes[: len(genome_codes) // 4 * 4].reshape(-1, 4)
    from grafimo_tpu.ops.score_runs import bytes_to_words

    genome4 = jax.device_put(
        bytes_to_words(
            (
                quads[:, 0]
                | (quads[:, 1] << 2)
                | (quads[:, 2] << 4)
                | (quads[:, 3] << 6)
            ).astype(np.uint8)
        )
    )
    gstart = jax.device_put(
        rng.integers(0, len(genome_codes) - R, B).astype(np.int32)
    )
    elems = B * noff * m  # window-strand elements per dispatch

    def timed(label, step, iters=12, fetch=np.asarray):
        """step(i) -> device value; chained via donation/accumulators by
        the caller.  Warmup once, then time `iters` dispatches ending in
        one value fetch (the only reliable barrier through the tunnel)."""
        out = step(0)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm + barrier
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(i)
        v = fetch(jax.tree_util.tree_leaves(out)[0])
        dt = time.perf_counter() - t0
        per = dt / iters
        print(
            f"{label:44s} {per * 1e3:9.2f} ms/iter  "
            f"{elems / per / 1e9:8.2f} G elem/s  checksum={int(np.sum(v))}",
            file=sys.stderr,
        )
        return per

    results = {}

    # --- full production kernel, current XLA histogram -----------------
    hist_acc = jnp.zeros((hist_size, m), jnp.int32)
    state = {"h": hist_acc}

    def full_step(i):
        h, hb, nh, tv = scan_runs_resident_topk(
            state["h"], genome4, None, gstart, None, pwm_dev, mins, cuts,
            R, k, hist_size, 4096,
        )
        state["h"] = h
        return h

    results["full_xla_hist"] = timed("full kernel (XLA hist)", full_step)

    # --- expand + conv only (scores, no hist / packaging) ---------------
    from grafimo_tpu.ops.score_runs import _window_scores

    @partial(jax.jit, static_argnames=("r", "kk"))
    def conv_only(g4, gs, pwm, mn, r, kk):
        codes = _expand_resident(g4, gs, r)
        # production formulation for this M (select/LUT or MXU conv)
        return _window_scores(codes, pwm, kk).sum()  # tiny fetch

    # --- candidate: transposed batched-matmul conv -----------------------
    # scoresT[b, m, o]: Noff on the lanes, contraction 4k -> pad 128 only
    # (the NWC conv pads its M-wide output to 128 lanes: 32x waste at M=2)
    @partial(jax.jit, static_argnames=("r", "kk"))
    def conv_tmm(g4, gs, pwm, r, kk):
        codes = _expand_resident(g4, gs, r)
        b = codes.shape[0]
        nf = r - kk + 1
        mc = pwm.shape[-1]
        onehotT = (
            codes[:, None, :]
            == jnp.arange(4, dtype=jnp.int32)[None, :, None]
        ).astype(jnp.bfloat16)  # (B, 4, R)
        rows = [
            jax.lax.slice(onehotT, (0, 0, j), (b, 4, j + nf))
            for j in range(kk)
        ]
        im2 = jnp.concatenate(rows, axis=1)  # (B, 4k, Noff)
        k_hi = jnp.floor(pwm / 4) * 4
        k_lo = pwm - k_hi
        split = jnp.concatenate([k_hi, k_lo], axis=-1)  # (k, 4, 2M)
        kmat = split.reshape(kk * 4, 2 * mc).T.astype(jnp.bfloat16)
        both = jnp.einsum(
            "xj,bjo->bxo", kmat, im2,
            preferred_element_type=jnp.float32,
        )  # (B, 2M, Noff)
        s = (both[:, :mc, :] + both[:, mc:, :]).astype(jnp.int32)
        return s.sum()

    results["conv_tmm"] = timed(
        "conv: transposed batched matmul",
        lambda i: conv_tmm(genome4, gstart, pwm_dev, R, k),
    )

    # --- candidate: MXU NWC conv (the pre-select formulation) ------------
    @partial(jax.jit, static_argnames=("r", "kk"))
    def conv_nwc(g4, gs, pwm, r, kk):
        codes = _expand_resident(g4, gs, r)
        onehot = (
            codes[:, :, None]
            == jnp.arange(4, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)
        mc = pwm.shape[-1]
        k_hi = jnp.floor(pwm / 4) * 4
        k_lo = pwm - k_hi
        split = jnp.concatenate([k_hi, k_lo], axis=-1).astype(jnp.bfloat16)
        both = jax.lax.conv_general_dilated(
            onehot, split, window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )
        s = (both[:, :, :mc] + both[:, :, mc:]).astype(jnp.int32)
        return s.sum()

    results["conv_nwc"] = timed(
        "conv: NWC MXU conv",
        lambda i: conv_nwc(genome4, gstart, pwm_dev, R, k),
    )

    results["expand_conv"] = timed(
        "expand + conv only",
        lambda i: conv_only(genome4, gstart, pwm_dev, mins, R, k),
    )

    # --- histogram alone over a resident scores tensor -------------------
    scores_host = rng.integers(
        -1, hist_size, (B, noff, m), dtype=np.int64
    ).astype(np.int32)
    scores_dev = jax.device_put(scores_host)

    @partial(jax.jit, static_argnames=("hs",))
    def xla_hist(acc, s, hs):
        return acc + _exact_hist(s, hs)

    st = {"a": jnp.zeros((hist_size, m), jnp.int32)}

    def xh_step(i):
        st["a"] = xla_hist(st["a"], scores_dev, hist_size)
        return st["a"]

    results["hist_xla"] = timed("hist only: XLA one-hot matmul", xh_step)

    for use_int8, label in ((False, "bf16"), (True, "int8")):
        st2 = {"a": jnp.zeros((hist_size, m), jnp.int32)}

        @partial(jax.jit, static_argnames=("hs", "u8"))
        def p_hist(acc, s, hs, u8):
            return acc + hist_pallas(s, hs, use_int8=u8)

        def ph_step(i, u8=use_int8):
            st2["a"] = p_hist(st2["a"], scores_dev, hist_size, u8)
            return st2["a"]

        try:
            results[f"hist_pallas_{label}"] = timed(
                f"hist only: Pallas {label}", ph_step
            )
        except Exception as e:  # int8 MXU may be unsupported on this gen
            print(f"hist pallas {label} FAILED: {e}", file=sys.stderr)
            results[f"hist_pallas_{label}"] = None

    # --- candidate: int8 one-hot XLA histogram (halved HBM traffic) ------
    n_hi_i = (hist_size + 255) // 256 + 1
    spill_i = (n_hi_i - 1) * 256

    @partial(jax.jit, static_argnames=("hs",))
    def xla_hist_int8(acc, s, hs):
        v = s.reshape(-1)
        v = jnp.where(v >= 0, v, jnp.int32(spill_i))
        total = jnp.zeros((n_hi_i, 256), jnp.int32)
        seg = 1 << 23
        n = v.shape[0]
        for s0 in range(0, n, seg):
            sv = jax.lax.slice(v, (s0,), (min(s0 + seg, n),))
            hi = sv // 256
            lo = sv % 256
            oh_hi = (
                hi[:, None] == jnp.arange(n_hi_i, dtype=jnp.int32)[None, :]
            ).astype(jnp.int8)
            oh_lo = (
                lo[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]
            ).astype(jnp.int8)
            c = jax.lax.dot_general(
                oh_hi, oh_lo, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            total = total + c
        return acc + total.reshape(-1)[:hs]

    st8 = {"a": jnp.zeros((hist_size,), jnp.int32)}

    def x8_step(i):
        st8["a"] = xla_hist_int8(st8["a"], scores_dev[:, :, 0], hist_size)
        return st8["a"]

    # scores_dev col 0 only: halve elems for this probe, scale back
    try:
        per = timed("hist only: XLA int8 one-hot (1 col)", x8_step)
        results["hist_xla_int8"] = per * 2  # normalise to 2 columns
    except Exception as e:
        print(f"int8 hist FAILED: {e}", file=sys.stderr)
        results["hist_xla_int8"] = None

    # --- full kernel with the Pallas histogram (env-gated path) ---------
    os.environ["GRAFIMO_PALLAS_HIST"] = "bf16"
    # the trace with the XLA hist is cached under the same avals — retrace
    scan_runs_resident_topk.clear_cache()
    state2 = {"h": jnp.zeros((hist_size, m), jnp.int32)}

    def full_pallas_step(i):
        h, hb, nh, tv = scan_runs_resident_topk(
            state2["h"], genome4, None, gstart, None, pwm_dev, mins,
            cuts, R, k, hist_size, 4096,
        )
        state2["h"] = h
        return h

    try:
        results["full_pallas_hist"] = timed(
            "full kernel (Pallas hist)", full_pallas_step
        )
    except Exception as e:
        print(f"full pallas FAILED: {e}", file=sys.stderr)
        results["full_pallas_hist"] = None

    # --- model / MFU ------------------------------------------------------
    peak = {
        # bf16 peak FLOP/s per chip
        "TPU v5 lite": 197e12, "TPU v5e": 197e12,
        "TPU v4": 275e12, "TPU v5p": 459e12, "TPU v6e": 918e12,
    }.get(dev.device_kind)
    n_hi = (hist_size + 255) // 256 + 1
    flops_elem_hw = 2 * 128 * 256 + 16 * k  # hw-padded hist + split conv
    flops_elem_model = 2 * n_hi * 256 + 16 * k
    report = {
        "device": dev.device_kind,
        "elems_per_dispatch": elems,
        "per_iter_s": results,
        "elem_per_s": {
            kk: (elems / v if v else None) for kk, v in results.items()
        },
        "flops_per_elem_hw": flops_elem_hw,
        "flops_per_elem_model": flops_elem_model,
    }
    if peak:
        best = min(v for v in (
            results.get("full_xla_hist"), results.get("full_pallas_hist")
        ) if v)
        report["mfu_best_full_hw"] = round(
            elems / best * flops_elem_hw / peak, 4
        )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
