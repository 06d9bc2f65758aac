"""Probe the host->device tunnel: per-transfer latency vs bandwidth.

Times N separate device_puts vs one combined put of the same bytes, each
drained by a dependent-sum fetch.  Run alone, under timeout."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    @jax.jit
    def total(xs):
        return sum(x.astype(jnp.int64).sum() for x in xs)

    def drain(arrs):
        return int(np.asarray(total(arrs)))

    # warm
    drain([jax.device_put(rng.integers(0, 255, 1024, dtype=np.uint8))])

    for n, size in [(24, 1 << 20), (1, 24 << 20), (96, 1 << 18),
                    (1, 24 << 20), (24, 1 << 20)]:
        host = [
            rng.integers(0, 255, size, dtype=np.uint8) for _ in range(n)
        ]
        t0 = time.perf_counter()
        dev = [jax.device_put(h) for h in host]
        drain(dev)
        dt = time.perf_counter() - t0
        mb = n * size / 1e6
        print(
            f"{n:3d} x {size / 1e6:6.2f} MB: {dt:7.3f}s  "
            f"{mb / dt:8.2f} MB/s  ({dt / n * 1e3:7.1f} ms/transfer)",
            flush=True,
        )


if __name__ == "__main__":
    main()
