"""Micro-bench: where do the strided expansion's milliseconds go?

Variants (all produce the conv's (B, R, 4) bf16 one-hot or its int32
codes precursor for B=2048, R=2048):

1. word-decode expand -> int32 codes        (production _expand_strided)
2. resident int8 code plane: slice+reshape  (candidate replacement)
3. int8 codes -> one-hot bf16
4. int32 codes -> one-hot bf16              (production)
5. int8 slice -> one-hot, one fused jit     (candidate end shape)

Run manually (never concurrently with another TPU process):

    timeout 1800 python tools/bench_expand_variants.py
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
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from grafimo_tpu.ops.score_runs import _expand_strided, bytes_to_words

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    B, R, k = 2048, 2048, 19
    stride = R - k + 1
    rng = np.random.default_rng(0)
    L = 64_000_000
    genome_codes = rng.integers(0, 4, L).astype(np.uint8)
    quads = genome_codes.reshape(-1, 4)
    packed = (
        quads[:, 0] | (quads[:, 1] << 2) | (quads[:, 2] << 4)
        | (quads[:, 3] << 6)
    ).astype(np.uint8)
    g32 = jax.device_put(bytes_to_words(packed))
    g8 = jax.device_put(genome_codes.astype(np.int8))
    lo0 = jnp.int32(173)
    n_out = B * R

    def timed(label, step, iters=12):
        out = step(0)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(i)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        per = (time.perf_counter() - t0) / iters
        print(
            f"{label:48s} {per * 1e3:8.2f} ms/iter "
            f"{n_out / per / 1e9:7.2f} G code/s",
            file=sys.stderr,
        )
        return per

    results = {}

    @partial(jax.jit, static_argnames=("b", "s", "r"))
    def v1(g, lo, b, s, r):
        return _expand_strided(g, lo, b, s, r, 2).sum()

    results["word_decode_to_i32"] = timed(
        "1 word-decode expand -> int32 codes",
        lambda i: v1(g32, lo0, B, stride, R),
    )

    def slice8(g, lo, b, s, r):
        span = jax.lax.dynamic_slice(g, (lo,), (b * s + r,))
        a = jax.lax.slice(span, (0,), (b * s,)).reshape(b, s)
        t = jax.lax.slice(span, (s,), (s + b * s,)).reshape(b, s)
        return jnp.concatenate(
            [a, jax.lax.slice(t, (0, 0), (b, r - s))], axis=1
        )

    @partial(jax.jit, static_argnames=("b", "s", "r"))
    def v2(g, lo, b, s, r):
        return slice8(g, lo, b, s, r).astype(jnp.int32).sum()

    results["i8_slice_reshape"] = timed(
        "2 int8 plane slice+reshape -> (B, R) int8",
        lambda i: v2(g8, lo0, B, stride, R),
    )

    codes8 = jax.block_until_ready(
        jax.jit(slice8, static_argnames=("b", "s", "r"))(
            g8, lo0, B, stride, R
        )
    )
    codes32 = jax.block_until_ready(
        jax.jit(_expand_strided, static_argnums=(2, 3, 4, 5))(
            g32, lo0, B, stride, R, 2
        )
    )

    @jax.jit
    def v3(c):
        oh = (
            c[:, :, None] == jnp.arange(4, dtype=c.dtype)[None, None, :]
        ).astype(jnp.bfloat16)
        return oh.sum()

    results["onehot_from_i8"] = timed(
        "3 int8 codes -> one-hot bf16", lambda i: v3(codes8)
    )
    results["onehot_from_i32"] = timed(
        "4 int32 codes -> one-hot bf16", lambda i: v3(codes32)
    )

    @partial(jax.jit, static_argnames=("b", "s", "r"))
    def v5(g, lo, b, s, r):
        c = slice8(g, lo, b, s, r)
        oh = (
            c[:, :, None] == jnp.arange(4, dtype=jnp.int8)[None, None, :]
        ).astype(jnp.bfloat16)
        return oh.sum()

    results["i8_slice_to_onehot_fused"] = timed(
        "5 int8 slice -> one-hot bf16 (one jit)",
        lambda i: v5(g8, lo0, B, stride, R),
    )

    @partial(jax.jit, static_argnames=("b", "s", "r"))
    def v6(g, lo, b, s, r):
        c = _expand_strided(g, lo, b, s, r, 2)
        oh = (
            c[:, :, None] == jnp.arange(4, dtype=jnp.int32)[None, None, :]
        ).astype(jnp.bfloat16)
        return oh.sum()

    results["word_decode_to_onehot_fused"] = timed(
        "6 word decode -> one-hot bf16 (one jit)",
        lambda i: v6(g32, lo0, B, stride, R),
    )

    print(json.dumps({
        "device": dev.device_kind,
        "codes_per_dispatch": n_out,
        "per_iter_s": results,
    }))


def main_aligned() -> None:
    """Variant set 2: does 128-aligning the stride (stride=2048, R=k+2047)
    make the slice+reshape free?"""
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from grafimo_tpu.ops.score_runs import _expand_strided, bytes_to_words

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    B, k = 2048, 19
    stride = 2048          # 128-aligned
    R = stride + k - 1     # 2066
    rng = np.random.default_rng(0)
    L = 64_000_000
    genome_codes = rng.integers(0, 4, L).astype(np.uint8)
    quads = genome_codes.reshape(-1, 4)
    packed = (
        quads[:, 0] | (quads[:, 1] << 2) | (quads[:, 2] << 4)
        | (quads[:, 3] << 6)
    ).astype(np.uint8)
    g32 = jax.device_put(bytes_to_words(packed))
    g8 = jax.device_put(genome_codes.astype(np.int8))
    n_out = B * R

    def timed(label, step, iters=12):
        out = step(0)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for i in range(iters):
            out = step(i)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        per = (time.perf_counter() - t0) / iters
        print(
            f"{label:48s} {per * 1e3:8.2f} ms/iter "
            f"{n_out / per / 1e9:7.2f} G code/s",
            file=sys.stderr,
        )
        return per

    results = {}

    def slice8(g, lo, b, s, r):
        span = jax.lax.dynamic_slice(g, (lo,), (b * s + r,))
        a = jax.lax.slice(span, (0,), (b * s,)).reshape(b, s)
        t = jax.lax.slice(span, (s,), (s + b * s,)).reshape(b, s)
        return jnp.concatenate(
            [a, jax.lax.slice(t, (0, 0), (b, r - s))], axis=1
        )

    for lo_v, tag in ((173, "lo173"), (0, "lo0")):
        lo0 = jnp.int32(lo_v)

        @partial(jax.jit, static_argnames=("b", "s", "r"))
        def v2(g, lo, b, s, r):
            return slice8(g, lo, b, s, r).astype(jnp.int32).sum()

        results[f"i8_slice_aligned_{tag}"] = timed(
            f"A2 int8 slice+reshape s=2048 {tag}",
            lambda i: v2(g8, lo0, B, stride, R),
        )

        @partial(jax.jit, static_argnames=("b", "s", "r"))
        def v5(g, lo, b, s, r):
            c = slice8(g, lo, b, s, r)
            oh = (
                c[:, :, None]
                == jnp.arange(4, dtype=jnp.int8)[None, None, :]
            ).astype(jnp.bfloat16)
            return oh.sum()

        results[f"i8_to_onehot_aligned_{tag}"] = timed(
            f"A5 int8 slice->one-hot s=2048 {tag}",
            lambda i: v5(g8, lo0, B, stride, R),
        )

        @partial(jax.jit, static_argnames=("b", "s", "r"))
        def v6(g, lo, b, s, r):
            c = _expand_strided(g, lo, b, s, r, 2)
            oh = (
                c[:, :, None]
                == jnp.arange(4, dtype=jnp.int32)[None, None, :]
            ).astype(jnp.bfloat16)
            return oh.sum()

        results[f"word_to_onehot_aligned_{tag}"] = timed(
            f"A6 word decode->one-hot s=2048 {tag}",
            lambda i: v6(g32, lo0, B, stride, R),
        )

    print(json.dumps({
        "device": dev.device_kind,
        "codes_per_dispatch": n_out,
        "per_iter_s": results,
    }))


if __name__ == "__main__":
    if "--aligned" in sys.argv:
        main_aligned()
    else:
        main()
