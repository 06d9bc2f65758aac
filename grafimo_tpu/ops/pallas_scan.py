"""Pallas TPU kernel: fused packed-window scoring.

The XLA packed path (``ops/score_jax.score_and_histogram_packed``) unpacks
2-bit codes and materialises a ``(B, 4k)`` float32 one-hot in HBM before the
MXU contraction — 64x the packed bytes.  This kernel keeps the whole
unpack -> one-hot -> contraction chain in VMEM: HBM traffic is the packed
bytes in and 4*M bytes of scores out per window.

Formulation notes (Mosaic-friendly, no 3-D reshapes):

* 2-bit unpack produces codes in *shift-major* order — ``concat([(p >> 0)
  & 3, (p >> 2) & 3, (p >> 4) & 3, (p >> 6) & 3], axis=1)`` puts position
  ``j = 4q + t`` at column ``t*W8 + q``.  Instead of reordering codes, the
  PWM rows are pre-permuted on the host to the same order
  (:func:`pwm_shift_major`).
* the one-hot contraction is expressed as four masked matmuls
  ``sum_c (codes == c) @ S_c`` with ``S_c (4*W8, M)`` — exact in float32
  (all values integers < 2^24).

Flag semantics match the rest of the pipeline: flag 1 (N window) scores
``min_score``, flag 2 (padding) scores -1.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grafimo_tpu.ops.pack import packed_width

TILE_B = 1024


def pwm_shift_major(pwm_mats, k: int) -> np.ndarray:
    """Stack ``(4, k)`` score matrices into ``(4, 4*W8, M)`` float32 with
    rows permuted to the kernel's shift-major column order (zero rows for
    padded positions ``j >= k``)."""
    w8 = packed_width(k)
    m = len(pwm_mats)
    out = np.zeros((4, 4 * w8, m), dtype=np.float32)
    for mi, mat in enumerate(pwm_mats):
        mat = np.asarray(mat, dtype=np.float32)
        for t in range(4):
            for q in range(w8):
                j = 4 * q + t
                if j < k:
                    out[:, t * w8 + q, mi] = mat[:, j]
    return out


def _scan_kernel(packed_ref, flags_ref, pwm_ref, mins_ref, out_ref):
    packed = packed_ref[:].astype(jnp.int32)  # (TILE_B, W8)
    parts = [(packed >> (2 * t)) & 3 for t in range(4)]
    codes = jnp.concatenate(parts, axis=1)  # (TILE_B, 4*W8) shift-major
    m = out_ref.shape[1]
    acc = jnp.zeros((codes.shape[0], m), dtype=jnp.float32)
    for c in range(4):
        mask = (codes == c).astype(jnp.float32)
        acc += jnp.dot(
            mask, pwm_ref[c, :, :], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    scores = acc.astype(jnp.int32)
    flags = flags_ref[:].astype(jnp.int32)  # (TILE_B, 1)
    scores = jnp.where(flags == 1, mins_ref[0, :][None, :], scores)
    scores = jnp.where(flags == 2, jnp.int32(-1), scores)
    out_ref[:] = scores


@partial(jax.jit, static_argnames=("interpret",))
def pallas_score_packed(packed, flags, pwm_sm, min_scores, interpret=False):
    """Score 2-bit packed windows with the fused Pallas kernel.

    Parameters: ``packed (B, W8) uint8``; ``flags (B,) uint8``;
    ``pwm_sm (4, 4*W8, M) f32`` from :func:`pwm_shift_major`;
    ``min_scores (M,) int32``.  ``B`` must be a multiple of ``TILE_B``
    (pad with flag-2 rows).  Returns ``(B, M) int32`` scores.
    """
    b, w8 = packed.shape
    m = pwm_sm.shape[-1]
    assert b % TILE_B == 0, "pad the batch to TILE_B (flag 2 rows)"
    grid = (b // TILE_B,)
    return pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((b, m), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TILE_B, w8), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TILE_B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (4, 4 * w8, m), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_B, m), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(packed, flags[:, None], pwm_sm, min_scores[None, :])
