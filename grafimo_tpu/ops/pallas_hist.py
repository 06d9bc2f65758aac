"""Pallas TPU kernel: exact integer score histogram.

The histogram is the production scan's dominant compute: per
window-strand-motif element, the exact joint (hi, lo) count costs
~2*hist_size MXU flops (vs ~16*k for the scoring conv itself — 128x less
at k=19).  The XLA formulation (``ops/score_runs._exact_hist``) builds
the two one-hot operands ``(n, n_hi)`` / ``(n, 256)`` in bf16 **in HBM**
(XLA:TPU does not fuse elementwise producers into dot operands), so every
element drags ~2*(n_hi+256) bytes through HBM — memory-bound well below
the MXU's speed of light.

This kernel streams score tiles into VMEM, builds the one-hot tiles
*in VMEM*, runs the two-plane contraction on the MXU and accumulates the
``(n_hi, 256)`` int32 counts across sequential grid steps — HBM traffic
drops to 4 bytes/element (the scores) and the kernel runs at the MXU
bound.

Exactness: per-tile counts are <= TILE_N (far below 2^24), so the f32/
int32 matmul accumulators are integer-exact; cross-tile accumulation is
int32.  This preserves the repo invariant that exact global BH q-values
derive from additive integer histograms.

Layout note: both one-hot widths are padded by the hardware to lane
multiples of 128, so the executed cost per element is 2*128*256 flops
for any ``hist_size`` in (16384, 32768] (k = 17..32) regardless of the
logical ``n_hi`` — the same padding physics applies to the XLA path.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_M = 16  # above this, callers keep the O(1)-compile XLA lax.map path

_LO = 256  # lo-plane width (score % 256); hi plane is ceil(hist/256)+spill


def _tile_n(m: int) -> int:
    """Contraction tile length: bound the block + per-column one-hot VMEM
    (scores block m*T*4B; one-hots ~T*(n_hi+256)*2B, reused across the
    column loop)."""
    return 8192 if m <= 4 else 2048


def _hist_kernel(
    scores_ref, out_ref, *, spill: int, n_hi: int, m: int, tile: int,
    op_dtype, lo_w: int,
):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc_t = jnp.int32 if op_dtype == jnp.int8 else jnp.float32
    for mi in range(m):  # static unroll; m <= MAX_M
        s = scores_ref[mi, :]  # (tile,) int32
        # invalid windows (score -1, incl. padding) go to the spill bin
        s = jnp.where(s < 0, jnp.int32(spill), s)
        hi = s // lo_w
        lo = s - hi * lo_w
        # build the hi plane already TRANSPOSED, (n_hi, tile): the dot is
        # then a standard (A, T) x (T, B) matmul — contracting dim 0 of a
        # (T, A) operand costs Mosaic a physical relayout of the whole
        # one-hot tile
        oh_hiT = (
            hi[None, :]
            == jax.lax.broadcasted_iota(jnp.int32, (n_hi, tile), 0)
        ).astype(op_dtype)
        oh_lo = (
            lo[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (tile, lo_w), 1)
        ).astype(op_dtype)
        counts = jax.lax.dot_general(
            oh_hiT,
            oh_lo,
            (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        ).astype(jnp.int32)  # (n_hi, lo_w); per-tile counts <= tile, exact
        out_ref[mi] += counts


@partial(
    jax.jit, static_argnames=("hist_size", "interpret", "use_int8", "lo_w")
)
def hist_pallas(
    scores: jnp.ndarray,
    hist_size: int,
    interpret: bool = False,
    use_int8: bool = False,
    lo_w: int = _LO,
) -> jnp.ndarray:
    """Exact integer histogram of ``scores (B, Noff, M) int32`` (negative
    = invalid, dropped).  Returns ``(hist_size, M) int32`` — same contract
    as ``score_runs._exact_hist``.

    ``use_int8`` runs the one-hot contraction on the int8 MXU path (2x
    peak on v5e+); both variants are integer-exact.  ``lo_w`` is the lo
    radix: 128 (one vreg of lanes) cuts the built one-hot cells per
    element from ``n_hi + 256`` to ``2*n_hi + 128`` — a win whenever
    ``n_hi < 128``, i.e. any k <= 32.
    """
    b, noff, m = scores.shape
    assert m <= MAX_M, "JASPAR-scale column counts keep the XLA path"
    n = b * noff
    n_hi = (hist_size + lo_w - 1) // lo_w + 1  # + spill row for invalid
    spill = (n_hi - 1) * lo_w
    tile = _tile_n(m)
    cols = jnp.moveaxis(scores.reshape(n, m), 0, 1)  # (M, N)
    pad = (-n) % tile
    if pad:
        cols = jnp.pad(cols, ((0, 0), (0, pad)), constant_values=-1)
    n_tiles = cols.shape[1] // tile
    # block = (m, tile): the sublane dim equals the full array dim (the
    # Mosaic block constraint for m not divisible by 8); the kernel loops
    # the m rows and accumulates across the sequential tile grid
    out = pl.pallas_call(
        partial(
            _hist_kernel,
            spill=spill,
            n_hi=n_hi,
            m=m,
            tile=tile,
            op_dtype=jnp.int8 if use_int8 else jnp.bfloat16,
            lo_w=lo_w,
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_hi, lo_w), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (m, tile), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, n_hi, lo_w), lambda j: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(cols)
    # (M, n_hi*lo_w) -> keep the real bins, spill (>= hist_size) dropped
    return jnp.moveaxis(out.reshape(m, n_hi * lo_w)[:, :hist_size], 0, 1)


_LO2 = 128  # v2 lo-plane width: exactly ONE vreg of lanes


def _hist2_kernel(
    scores_ref, out_ref, *, spill: int, n_hi: int, m: int, tile: int,
    op_dtype,
):
    """v2 one-hot build: the compare/select chains run in the OPERAND
    dtype's native packed layout (bf16 = (16,128) vregs, 2 cells per
    32-bit lane; int8 = (32,128), 4 cells per lane) instead of v1's
    int32 compare -> convert chain, and the lo plane is one vreg wide
    (128 lanes) instead of two.  Exactness: hi < 256 and lo < 128 are
    exactly representable in bf16 (8-bit mantissa) and, shifted, in
    int8; per-tile counts <= tile << 2^24 keep the f32/int32 MXU
    accumulators integer-exact."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    acc_t = jnp.int32 if op_dtype == jnp.int8 else jnp.float32
    # loop-invariant iotas, converted once (Mosaic hoists across the m
    # unroll).  Sub-32-bit layouts only ever get MAJOR-dim broadcasts:
    # minor-dim inserts on i8/bf16 vectors do not lower on TPU.
    if op_dtype == jnp.int8:
        # shift into int8 range: hi - 128 in [-128, n_hi-129],
        # lo - 64 in [-64, 63]; iotas shifted identically
        iota_hi = (
            jax.lax.broadcasted_iota(jnp.int32, (n_hi, tile), 0) - 128
        ).astype(jnp.int8)
        iota_loT = (
            jax.lax.broadcasted_iota(jnp.int32, (_LO2, tile), 0) - 64
        ).astype(jnp.int8)
    else:
        iota_hi = jax.lax.broadcasted_iota(
            jnp.int32, (n_hi, tile), 0
        ).astype(op_dtype)
        iota_loT = jax.lax.broadcasted_iota(
            jnp.int32, (_LO2, tile), 0
        ).astype(op_dtype)
    one = jnp.ones((), op_dtype)
    zero = jnp.zeros((), op_dtype)
    for mi in range(m):  # static unroll; m <= MAX_M
        s = scores_ref[mi, :]  # (tile,) int32
        s = jnp.where(s < 0, jnp.int32(spill), s)
        hi = s // _LO2
        lo = s - hi * _LO2
        if op_dtype == jnp.int8:
            hi_n = (hi - 128).astype(jnp.int8)
            lo_n = (lo - 64).astype(jnp.int8)
        else:
            hi_n = hi.astype(op_dtype)
            lo_n = lo.astype(op_dtype)
        oh_hiT = jnp.where(hi_n[None, :] == iota_hi, one, zero)
        oh_loT = jnp.where(lo_n[None, :] == iota_loT, one, zero)
        counts = jax.lax.dot_general(
            oh_hiT,
            oh_loT,
            (((1,), (1,)), ((), ())),
            preferred_element_type=acc_t,
        ).astype(jnp.int32)  # (n_hi, 128)
        out_ref[mi] += counts


@partial(
    jax.jit, static_argnames=("hist_size", "interpret", "use_int8")
)
def hist_pallas2(
    scores: jnp.ndarray,
    hist_size: int,
    interpret: bool = False,
    use_int8: bool = False,
) -> jnp.ndarray:
    """v2 of :func:`hist_pallas` — same contract, lo=128 radix +
    dtype-native one-hot build (see ``_hist2_kernel``)."""
    b, noff, m = scores.shape
    assert m <= MAX_M, "JASPAR-scale column counts keep the XLA path"
    n = b * noff
    n_hi = (hist_size + _LO2 - 1) // _LO2 + 1  # + spill row for invalid
    assert n_hi <= 256, (  # bf16/int8 exactness bound: k <= 32
        "hist_size too large for the v2 dtype-native one-hot build"
    )
    spill = (n_hi - 1) * _LO2
    tile = _tile_n(m)
    cols = jnp.moveaxis(scores.reshape(n, m), 0, 1)  # (M, N)
    pad = (-n) % tile
    if pad:
        cols = jnp.pad(cols, ((0, 0), (0, pad)), constant_values=-1)
    n_tiles = cols.shape[1] // tile
    out = pl.pallas_call(
        partial(
            _hist2_kernel,
            spill=spill,
            n_hi=n_hi,
            m=m,
            tile=tile,
            op_dtype=jnp.int8 if use_int8 else jnp.bfloat16,
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_hi, _LO2), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (m, tile), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, n_hi, _LO2), lambda j: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(cols)
    return jnp.moveaxis(out.reshape(m, n_hi * _LO2)[:, :hist_size], 0, 1)


def _hist3_kernel(
    scores_ref, out_ref, iota_hi_ref, iota_lo_ref, *, spill: int,
    n_hi: int, m: int, tile: int, op_dtype,
):
    """v3 one-hot build: the bin iotas live in VMEM SCRATCH, generated
    once at grid step 0 and reused by every subsequent tile — v1
    regenerates both (n_hi, tile) and (tile, 128) iota planes every
    grid step, ~1/3 of the per-cell VPU work.  Digit split is shift/
    mask (lo radix fixed at 128).  Compares stay int32 (v5e Mosaic
    cannot lower sub-32-bit vector compares — the v2 lesson); only the
    compare RESULT converts to the matmul operand dtype."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)
        iota_hi_ref[:] = jax.lax.broadcasted_iota(
            jnp.int32, (n_hi, tile), 0
        )
        iota_lo_ref[:] = jax.lax.broadcasted_iota(
            jnp.int32, (tile, _LO2), 1
        )

    acc_t = jnp.float32
    for mi in range(m):  # static unroll; m <= MAX_M
        s = scores_ref[mi, :]  # (tile,) int32
        s = jnp.where(s < 0, jnp.int32(spill), s)
        hi = s >> 7
        lo = s & 127
        oh_hiT = (hi[None, :] == iota_hi_ref[:]).astype(op_dtype)
        oh_lo = (lo[:, None] == iota_lo_ref[:]).astype(op_dtype)
        counts = jax.lax.dot_general(
            oh_hiT,
            oh_lo,
            (((1,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        ).astype(jnp.int32)  # (n_hi, 128); per-tile counts <= tile, exact
        out_ref[mi] += counts


@partial(
    jax.jit, static_argnames=("hist_size", "interpret", "use_f32", "tile")
)
def hist_pallas3(
    scores: jnp.ndarray,
    hist_size: int,
    interpret: bool = False,
    use_f32: bool = False,
    tile: int = 4096,
) -> jnp.ndarray:
    """v3 of :func:`hist_pallas` — same contract; lo=128 radix, bin
    iotas persisted in VMEM scratch across grid steps (see
    ``_hist3_kernel``).  ``use_f32`` runs the one-hot contraction with
    f32 operands: the compare mask (32-bit layout) selects into a
    same-layout f32 one-hot — no 32->16-bit relayout — at the cost of
    the slower f32 MXU path.

    MEASURED AND REJECTED on v5e (tools/bench_hist2.py --only-hist,
    8.3M elems): v1 lo=128 7.99 ms, v3 bf16 8.47 ms, v3 f32 10.42 ms,
    v3 bf16 tile=8192 9.34 ms — identical checksums.  Iota regeneration
    is NOT the per-tile bottleneck and scratch residency buys nothing;
    the 32→16-bit convert is cheaper than the f32 MXU path.  v1 stays
    the production single-device histogram; v3 is kept exactness-tested
    for re-measurement on other generations."""
    b, noff, m = scores.shape
    assert m <= MAX_M, "JASPAR-scale column counts keep the XLA path"
    n = b * noff
    n_hi = (hist_size + _LO2 - 1) // _LO2 + 1  # + spill row for invalid
    spill = (n_hi - 1) * _LO2
    cols = jnp.moveaxis(scores.reshape(n, m), 0, 1)  # (M, N)
    pad = (-n) % tile
    if pad:
        cols = jnp.pad(cols, ((0, 0), (0, pad)), constant_values=-1)
    n_tiles = cols.shape[1] // tile
    out = pl.pallas_call(
        partial(
            _hist3_kernel,
            spill=spill,
            n_hi=n_hi,
            m=m,
            tile=tile,
            op_dtype=jnp.float32 if use_f32 else jnp.bfloat16,
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_hi, _LO2), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (m, tile), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, n_hi, _LO2), lambda j: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((n_hi, tile), jnp.int32),
            pltpu.VMEM((tile, _LO2), jnp.int32),
        ],
        interpret=interpret,
    )(cols)
    return jnp.moveaxis(out.reshape(m, n_hi * _LO2)[:, :hist_size], 0, 1)


def _hist4_kernel(
    scores_ref, out_ref, *, spill: int, n_hi: int, m: int, tile: int,
    op_dtype,
):
    """v4: scores arrive as ``(tile, m)`` blocks — tile on SUBLANES — so
    BOTH one-hot builds are spread-free: ``s = block[:, mi]`` is already
    the ``(tile, 1)`` sublane-major vector the ``(tile, plane)`` compares
    broadcast from.  v1's hidden cost was the ``(tile,) -> (tile, 1)``
    lane->sublane spread of the score vector plus the XLA-side
    ``(n, m) -> (m, n)`` transpose feeding the kernel; here the only
    relayout left is whichever matmul operand Mosaic transposes for the
    sublane-contracting dot (the small ``(tile, n_hi)`` plane)."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    for mi in range(m):  # static unroll; m <= MAX_M
        s = scores_ref[:, mi : mi + 1]  # (tile, 1) int32, sublane-major
        s = jnp.where(s < 0, jnp.int32(spill), s)
        hi = s >> 7
        lo = s & 127
        oh_hi = (
            hi == jax.lax.broadcasted_iota(jnp.int32, (tile, n_hi), 1)
        ).astype(op_dtype)
        oh_lo = (
            lo == jax.lax.broadcasted_iota(jnp.int32, (tile, _LO2), 1)
        ).astype(op_dtype)
        counts = jax.lax.dot_general(
            oh_hi,
            oh_lo,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # (n_hi, 128); per-tile counts <= tile
        out_ref[mi] += counts


@partial(jax.jit, static_argnames=("hist_size", "interpret", "tile"))
def hist_pallas4(
    scores: jnp.ndarray,
    hist_size: int,
    interpret: bool = False,
    tile: int = 4096,
) -> jnp.ndarray:
    """v4 of :func:`hist_pallas` — same contract; consumes the scores in
    their native ``(n, m)`` layout (no XLA transpose), lo radix 128, both
    one-hots built sublane-major (see ``_hist4_kernel``)."""
    b, noff, m = scores.shape
    assert m <= MAX_M, "JASPAR-scale column counts keep the XLA path"
    n = b * noff
    n_hi = (hist_size + _LO2 - 1) // _LO2 + 1  # + spill row for invalid
    spill = (n_hi - 1) * _LO2
    cols = scores.reshape(n, m)  # contiguous — no transpose
    pad = (-n) % tile
    if pad:
        cols = jnp.pad(cols, ((0, pad), (0, 0)), constant_values=-1)
    n_tiles = cols.shape[0] // tile
    out = pl.pallas_call(
        partial(
            _hist4_kernel,
            spill=spill,
            n_hi=n_hi,
            m=m,
            tile=tile,
            op_dtype=jnp.bfloat16,
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_hi, _LO2), jnp.int32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (tile, m), lambda j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (m, n_hi, _LO2), lambda j: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(cols)
    return jnp.moveaxis(out.reshape(m, n_hi * _LO2)[:, :hist_size], 0, 1)


def hist_pallas_reference(scores: np.ndarray, hist_size: int) -> np.ndarray:
    """Host oracle: per-column ``np.bincount`` over the valid scores."""
    b, noff, m = scores.shape
    flat = scores.reshape(-1, m)
    out = np.zeros((hist_size, m), dtype=np.int32)
    for col in range(m):
        v = flat[:, col]
        v = v[v >= 0]
        out[:, col] = np.bincount(v, minlength=hist_size)[:hist_size]
    return out
