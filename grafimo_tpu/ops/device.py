"""Device session helpers.

The TPU-tunnel environments this framework targets have a large one-time
cost for the FIRST device->host transfer of a process (tens of seconds of
transfer-path establishment, independent of payload size).  Production
scans overlap that cost with host-side extraction by firing a trivial
round-trip on a background thread as early as possible.
"""

import threading

_warm_thread = None
_lock = threading.Lock()


def start_device_warmup() -> None:
    """Begin device init + first host<->device round-trip in the
    background (idempotent)."""
    global _warm_thread
    with _lock:
        if _warm_thread is not None:
            return

        def _warm():
            try:
                import jax.numpy as jnp
                import numpy as np

                np.asarray(jnp.zeros((8,), jnp.int32) + 1)
            except Exception:
                pass

        _warm_thread = threading.Thread(
            target=_warm, name="grafimo-device-warmup", daemon=True
        )
        _warm_thread.start()


def wait_device_warm(timeout=None) -> None:
    if _warm_thread is not None:
        _warm_thread.join(timeout)
