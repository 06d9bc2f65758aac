"""A-B-A timing of the hit-packaging formulations inside the FULL
production strided kernel (same dispatch shape, so the per-dispatch
tunnel floor cancels in differences — see tools/bench_ablate.py):

  full_flat     expand + conv + hist + hitbits + _topk_package_flat
  full_tiered   expand + conv + hist + hitbits + _topk_package_tiered

The random genome at the p<1e-4 cutoff gives ~800 hits per 8.3M-window
slice, so the cond-gated extraction RUNS in both variants — this is the
hitful production case.  Checksums of (hist, n_hits, top_vals) are
asserted equal across variants before timing is reported.

Run manually (never concurrently with another TPU process):

    timeout 1800 python tools/bench_package.py
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

    def make_full(package):
        @jax.jit
        def full(acc, lo):
            s = scores_of(lo)
            hist = hist_of(s)
            hb = hitbits_of(s)
            h2, hb2, nh, tv = package(acc, hist, hb, noff, m, 8192)
            return (
                h2.at[0, 0].add(
                    nh + tv.sum() + hb2.sum().astype(jnp.int32)
                ),
                nh,
                tv,
            )

        return full

    full_flat = make_full(sr._topk_package_flat)
    full_tiered = make_full(sr._topk_package_tiered)

    # experimental: tiered WITHOUT the ascending (B, 256) sort — within-
    # row hits come out in (offset_byte, motif, bit) enumeration order
    # instead of flat ascending order (a contract relaxation: the global
    # scatter still places every hit in the first n_hits slots).  Rank
    # extraction over the candidates replaces the sort.
    import jax.numpy as _j

    def _package_nosort(hist_acc, hist, hitbits, noff, m, topk):
        b = hitbits.shape[0]
        q = hitbits.shape[1] * m
        bytes2d = hitbits.reshape(b, q)
        cnt = _j.sum(
            jax.lax.population_count(bytes2d).astype(_j.int32), axis=1
        )
        S = sr._ROW_SLOTS
        k_slots = min(topk, b * S)

        def _extract(args):
            bytes2d, cnt = args
            nz = (bytes2d > 0).astype(_j.int32)
            brank = _j.cumsum(nz, axis=1)
            qi = jax.lax.broadcasted_iota(_j.int32, (b, q), 1)
            enc = ((qi + 1) << 8) | bytes2d.astype(_j.int32)
            slot_cols = [
                _j.sum(
                    _j.where((brank == (s + 1)) & (nz > 0), enc, 0),
                    axis=1,
                )
                for s in range(S)
            ]
            slot_enc = _j.stack(slot_cols, axis=1)
            bq = (slot_enc >> 8) - 1
            val = slot_enc & 255
            bits = (val[:, :, None] >> _j.arange(8, dtype=_j.int32)) & 1
            o8 = bq // m
            mi = bq - o8 * m
            off = o8[:, :, None] * 8 + _j.arange(8, dtype=_j.int32)
            rows = jax.lax.broadcasted_iota(_j.int32, (b, S, 8), 0)
            gidx = (rows * noff + off) * m + mi[:, :, None] + 1
            valid = (
                (slot_enc[:, :, None] > 0) & (bits > 0) & (off < noff)
            )
            vc = valid.reshape(b, S * 8).astype(_j.int32)
            gc = _j.where(valid, gidx, 0).reshape(b, S * 8)
            crank = _j.cumsum(vc, axis=1)
            cand_cols = [
                _j.sum(
                    _j.where((crank == (s + 1)) & (vc > 0), gc, 0),
                    axis=1,
                )
                for s in range(S)
            ]
            cand = _j.stack(cand_cols, axis=1)  # (B, S) enum order
            srange = _j.arange(S, dtype=_j.int32)
            vslot = srange[None, :] < _j.minimum(cnt, S)[:, None]
            slot_mat = _j.where(vslot, cand, 0)
            base = _j.cumsum(cnt) - cnt
            tgt = _j.where(
                vslot,
                _j.minimum(base[:, None] + srange[None, :], k_slots - 1),
                k_slots,
            )
            return (
                _j.zeros((k_slots,), _j.int32)
                .at[tgt.reshape(-1)]
                .max(slot_mat.reshape(-1), mode="drop")
            )

        n_hits = cnt.sum().astype(_j.int32)
        top_vals = jax.lax.cond(
            n_hits > 0,
            _extract,
            lambda args: _j.zeros((k_slots,), _j.int32),
            (bytes2d, cnt),
        )
        n_hits = _j.where(
            (cnt > S).any(), _j.maximum(n_hits, topk + 1), n_hits
        )
        return (
            hist_acc + hist.astype(hist_acc.dtype), hitbits, n_hits,
            top_vals,
        )

    full_nosort = make_full(_package_nosort)

    # exactness gate: identical (hist+checksum, n_hits, top_vals)
    acc0 = jnp.zeros((comp_size, m), jnp.int32)
    hf, nhf, tvf = full_flat(acc0, lo0)
    ht, nht, tvt = full_tiered(acc0, lo0)
    assert int(nhf) == int(nht), (int(nhf), int(nht))
    np.testing.assert_array_equal(np.asarray(tvf), np.asarray(tvt))
    np.testing.assert_array_equal(np.asarray(hf), np.asarray(ht))
    print(
        f"checksums equal: n_hits={int(nhf)} "
        f"hist_sum={int(np.asarray(hf).sum())}",
        file=sys.stderr,
    )

    def timed(label, fn, iters=12):
        st = jnp.zeros((comp_size, m), jnp.int32)
        st, _, _ = fn(st, lo0)
        np.asarray(st)
        t0 = time.perf_counter()
        for _ in range(iters):
            st, _, _ = fn(st, lo0)
        np.asarray(st)
        per = (time.perf_counter() - t0) / iters
        print(
            f"{label:28s} {per * 1e3:8.2f} ms/iter "
            f"{elems / per / 1e9:7.2f} G ws/s",
            file=sys.stderr,
        )
        return per

    # the no-sort variant must agree on n_hits and the SET of hits
    hn, nhn, tvn = full_nosort(acc0, lo0)
    assert int(nhn) == int(nhf)
    np.testing.assert_array_equal(np.asarray(hn), np.asarray(hf))
    np.testing.assert_array_equal(
        np.sort(np.asarray(tvn)), np.sort(np.asarray(tvf))
    )

    # A-B-A-C-A: flat, tiered, nosort, flat again (tunnel drift guard)
    results = {}
    results["full_flat_a"] = timed("full_flat (A)", full_flat)
    results["full_tiered"] = timed("full_tiered (B)", full_tiered)
    results["full_nosort"] = timed("full_nosort (C)", full_nosort)
    results["full_flat_b"] = timed("full_flat (A again)", full_flat)

    print(json.dumps({
        "device": dev.device_kind,
        "elems_per_dispatch": elems,
        "per_iter_s": results,
    }))


if __name__ == "__main__":
    main()
