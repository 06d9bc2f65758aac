"""Pallas fused scan kernel vs the XLA reference path (interpret mode on
CPU; the compiled kernel is exercised on TPU by the benchmark)."""

import numpy as np
import pytest

from grafimo_tpu.models.parse import load_motifs
from grafimo_tpu.ops.pack import pack_codes
from grafimo_tpu.ops.pallas_scan import (
    TILE_B,
    pallas_score_packed,
    pwm_shift_major,
)
from grafimo_tpu.ops.score_jax import (
    pwms_to_flat,
    reverse_complement_pwm,
    score_batch,
)
from grafimo_tpu.utils.constants import N_CODE, PAD_CODE, UNIF


@pytest.fixture(scope="module")
def ctcf(input_dir):
    return load_motifs(str(input_dir / "MA0139.1.meme"), UNIF, 0.1, False)[0]


def test_pallas_matches_xla(ctcf):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (TILE_B * 2, 19)).astype(np.uint8)
    codes[5, 2] = N_CODE
    codes[-1, :] = PAD_CODE
    mats = [ctcf.score_matrix, reverse_complement_pwm(ctcf.score_matrix)]
    mins = np.array([ctcf.min_score] * 2, dtype=np.int32)
    want = np.array(score_batch(codes, pwms_to_flat(mats), mins))
    want[-1, :] = -1  # PAD rows score -1 in the packed/pallas contract
    packed, flags = pack_codes(codes)
    got = np.asarray(
        pallas_score_packed(
            packed, flags, pwm_shift_major(mats, 19), mins, interpret=True
        )
    )
    np.testing.assert_array_equal(got, want)


def test_pwm_shift_major_layout(ctcf):
    sm = pwm_shift_major([ctcf.score_matrix], 19)
    w8 = 5
    assert sm.shape == (4, 4 * w8, 1)
    # position j = 4q + t lives at column t*W8 + q
    for j in [0, 1, 7, 18]:
        q, t = divmod(j, 4)
        np.testing.assert_array_equal(
            sm[:, t * w8 + q, 0], ctcf.score_matrix[:, j].astype(np.float32)
        )
    # padded position 19 is a zero column
    q, t = divmod(19, 4)
    assert (sm[:, t * w8 + q, 0] == 0).all()
