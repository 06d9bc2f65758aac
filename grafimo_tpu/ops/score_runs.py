"""Device-side run scanning: expand + score every stride-1 window of a run
batch in one fused program.

Input per run (all bit-packed on the wire — this is what crosses the
host->device link instead of materialised windows):

* ``packed (B, R/4) uint8`` — 2-bit base codes, 4 bases/byte;
* ``nbits (B, R/8) uint8`` — N-base indicator bits;
* ``vbits (B, ceil(Noff/8)) uint8`` — window-validity bits
  (``Noff = R - k + 1`` stride-1 offsets).

The scan is a 1-D convolution of the one-hot sequence with the ``(k, 4,
M)`` PWM stack (forward + reverse-complement PWMs as extra M columns), so
the MXU does the window expansion implicitly — no (B*Noff, k) window tensor
ever exists in HBM.  N-windows are detected with a cumulative-sum trick and
scored ``min_score`` (reference ``score_sequences.py:376-378``); invalid
offsets score -1 and are excluded from the histogram and hit bits.

Outputs: the exact integer score histogram per motif column and a packed
hit bitmask (``score >= cutoff``), both tiny on the wire.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pack_run_seqs(codes: np.ndarray) -> np.ndarray:
    """Pack ``(B, R)`` base codes (0..3; other values masked separately)
    into ``(B, R/4)`` uint8.  R must be a multiple of 4."""
    b, r = codes.shape
    assert r % 4 == 0
    quads = np.minimum(codes, 3).astype(np.uint8).reshape(b, r // 4, 4)
    return (
        quads[:, :, 0]
        | (quads[:, :, 1] << 2)
        | (quads[:, :, 2] << 4)
        | (quads[:, :, 3] << 6)
    ).astype(np.uint8)


def pack_bits(bits: np.ndarray) -> np.ndarray:
    """Pack ``(B, L)`` booleans into ``(B, ceil(L/8))`` uint8
    (little-endian bit order)."""
    return np.packbits(bits.astype(np.uint8), axis=1, bitorder="little")


def pwms_to_conv_kernel(score_matrices) -> np.ndarray:
    """Stack ``(4, k)`` integer score matrices into a ``(k, 4, M)`` f32
    convolution kernel."""
    mats = [np.asarray(m, dtype=np.float32).T for m in score_matrices]
    return np.ascontiguousarray(np.stack(mats, axis=-1))


def _unpack2(packed: jnp.ndarray) -> jnp.ndarray:
    shifts = jnp.arange(4, dtype=jnp.int32) * 2
    quads = (packed.astype(jnp.int32)[:, :, None] >> shifts[None, None, :]) & 3
    return quads.reshape(packed.shape[0], -1)


def _unpack1(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    shifts = jnp.arange(8, dtype=jnp.int32)
    bits = (packed.astype(jnp.int32)[:, :, None] >> shifts[None, None, :]) & 1
    return bits.reshape(packed.shape[0], -1)[:, :n]


def _scan_core(
    packed, nbits, vbits, pwm_kernel, min_scores, cutoffs, k: int,
    hist_size: int,
):
    """``nbits``/``vbits`` may be ``None`` (static, trace-time): a clean
    batch (no N bases / every offset valid) then skips the mask upload
    and the masking arithmetic entirely — in production scans most
    batches are clean and this trims ~40% off the host->device bytes."""
    b, w4 = packed.shape
    r = w4 * 4
    noff = r - k + 1
    codes = _unpack2(packed)  # (B, R)
    onehot = (
        codes[:, :, None] == jnp.arange(4, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)
    scores = jax.lax.conv_general_dilated(
        onehot,
        pwm_kernel,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)  # (B, Noff, M)
    m = scores.shape[-1]
    if nbits is not None:
        # N-window detection via cumulative sums of the N indicator
        n_ind = _unpack1(nbits, r)  # (B, R) 0/1
        cum = jnp.concatenate(
            [jnp.zeros((b, 1), jnp.int32), jnp.cumsum(n_ind, axis=1)],
            axis=1,
        )
        has_n = (cum[:, k:] - cum[:, :-k]) > 0  # (B, Noff)
        scores = jnp.where(
            has_n[:, :, None], min_scores[None, None, :], scores
        )
    if vbits is not None:
        valid = _unpack1(vbits, noff).astype(bool)  # (B, Noff)
        scores = jnp.where(valid[:, :, None], scores, jnp.int32(-1))
    # exact per-motif histogram over valid windows
    flat = scores.reshape(-1, m)
    m_idx = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[None, :], flat.shape
    )
    ok = (flat >= 0).astype(jnp.int32)
    hist = jnp.zeros((hist_size, m), jnp.int32)
    hist = hist.at[jnp.clip(flat, 0, hist_size - 1), m_idx].add(ok)
    # packed hit bits
    hit = (scores >= cutoffs[None, None, :]) & (scores >= 0)
    pad = (-noff) % 8
    hit = jnp.pad(hit, ((0, 0), (0, pad), (0, 0)))
    hit = hit.reshape(b, -1, 8, m).astype(jnp.uint8)
    weights = (1 << jnp.arange(8, dtype=jnp.uint8))[None, None, :, None]
    hitbits = jnp.sum(hit * weights, axis=2).astype(jnp.uint8)
    return hist, hitbits


@partial(jax.jit, static_argnames=("k", "hist_size"))
def scan_runs_device(
    packed, nbits, vbits, pwm_kernel, min_scores, cutoffs, k: int,
    hist_size: int,
):
    """Scan a padded run batch.

    Returns ``(hist (hist_size, M) int32, hitbits (B, ceil(Noff/8), M)
    uint8)``.
    """
    return _scan_core(
        packed, nbits, vbits, pwm_kernel, min_scores, cutoffs, k, hist_size
    )


@partial(
    jax.jit, static_argnames=("k", "hist_size", "topk"), donate_argnums=(0,)
)
def scan_runs_device_topk(
    hist_acc, packed, nbits, vbits, pwm_kernel, min_scores, cutoffs,
    k: int, hist_size: int, topk: int,
):
    """Accumulating scan with on-device hit compaction.

    Hits are returned as the ``topk`` largest flat indices of the masked
    score tensor — a few KB on the wire instead of the full hit bitmask.
    When a slice holds more than ``topk`` hits (``n_hits`` says so), the
    caller falls back to fetching ``hitbits``.  Flat index layout is
    C-order over ``(row, offset, motif)``.
    """
    hist, hitbits = _scan_core(
        packed, nbits, vbits, pwm_kernel, min_scores, cutoffs, k, hist_size
    )
    n_hits = jnp.sum(
        jax.lax.population_count(hitbits.astype(jnp.uint32))
    ).astype(jnp.int32)
    b, w4 = packed.shape
    noff = w4 * 4 - k + 1
    m = pwm_kernel.shape[-1]
    # rebuild the hit predicate from the packed bits to avoid re-deriving
    # scores: unpack hitbits (cheap) and flatten
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (hitbits[:, :, None, :] >> shifts[None, None, :, None]) & 1
    bits = bits.reshape(b, -1, m)[:, :noff, :]
    flat = bits.reshape(-1).astype(jnp.int32)
    # top-k over the 0/1 predicate weighted by index recency would lose
    # order; instead weight hits by their flat position so indices decode
    # directly: value = flat_index + 1 for hits, 0 otherwise
    idx = jax.lax.broadcasted_iota(jnp.int32, flat.shape, 0)
    vals = jnp.where(flat > 0, idx + 1, 0)
    # when the slice has fewer positions than topk, every hit fits anyway
    top_vals, _ = jax.lax.top_k(vals, min(topk, vals.shape[0]))
    return (
        hist_acc + hist.astype(hist_acc.dtype), hitbits, n_hits,
        top_vals,  # hit flat indices + 1, descending; 0 = empty slot
    )


@partial(jax.jit, static_argnames=("k", "hist_size"), donate_argnums=(0,))
def scan_runs_device_acc(
    hist_acc, packed, nbits, vbits, pwm_kernel, min_scores, cutoffs,
    k: int, hist_size: int,
):
    """Accumulating variant: adds this batch's histogram into the donated
    device-resident accumulator and also returns the batch hit count, so
    the host can skip fetching hit bits for hitless batches — in a
    production scan almost every batch is hitless and nothing but a
    scalar crosses the device->host link per batch (the histogram is
    fetched once per scan; device->host round trips through the TPU
    tunnel are expensive)."""
    hist, hitbits = _scan_core(
        packed, nbits, vbits, pwm_kernel, min_scores, cutoffs, k, hist_size
    )
    # popcount of the packed hit bits = number of hits in this batch
    n_hits = jnp.sum(
        jax.lax.population_count(hitbits.astype(jnp.uint32))
    ).astype(jnp.int32)
    return hist_acc + hist.astype(hist_acc.dtype), hitbits, n_hits


def unpack_hitbits(hitbits: np.ndarray, noff: int) -> np.ndarray:
    """Host-side ``(B, ceil(Noff/8), M) -> (B, Noff, M)`` bool."""
    b, _, m = hitbits.shape
    bits = np.unpackbits(
        np.moveaxis(hitbits, 1, 2).reshape(b * m, -1),
        axis=1,
        bitorder="little",
    )[:, :noff]
    return np.moveaxis(bits.reshape(b, m, noff), 2, 1).astype(bool)
