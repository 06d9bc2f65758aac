"""2-bit packing round-trip and packed-scoring equivalence."""

import numpy as np
import pytest

from grafimo_tpu.models.parse import load_motifs
from grafimo_tpu.ops.pack import (
    FLAG_N,
    FLAG_PAD,
    pack_codes,
    packed_width,
    unpack_codes,
)
from grafimo_tpu.ops.score_jax import (
    hist_size_for_width,
    pwms_to_flat,
    reverse_complement_pwm,
    score_and_histogram,
    score_and_histogram_packed,
)
from grafimo_tpu.utils.constants import N_CODE, PAD_CODE, UNIF


def test_pack_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, (257, 19)).astype(np.uint8)
    packed, flags = pack_codes(codes)
    assert packed.shape == (257, packed_width(19)) == (257, 5)
    assert (flags == 0).all()
    np.testing.assert_array_equal(unpack_codes(packed, 19), codes)


def test_pack_flags():
    codes = np.zeros((3, 19), dtype=np.uint8)
    codes[1, 5] = N_CODE
    codes[2, 0] = PAD_CODE
    _, flags = pack_codes(codes)
    assert flags.tolist() == [0, FLAG_N, FLAG_PAD]


def test_packed_scoring_matches_unpacked(input_dir):
    motif = load_motifs(str(input_dir / "MA0139.1.meme"), UNIF, 0.1, False)[0]
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, (512, 19)).astype(np.uint8)
    codes[7, 3] = N_CODE  # one N window
    pwm = pwms_to_flat(
        [motif.score_matrix, reverse_complement_pwm(motif.score_matrix)]
    )
    mins = np.array([motif.min_score] * 2, dtype=np.int32)
    hs = hist_size_for_width(19)
    s_ref, h_ref = score_and_histogram(codes, pwm, mins, hs)
    packed, flags = pack_codes(codes)
    s_p, h_p = score_and_histogram_packed(packed, flags, pwm, mins, 19, hs)
    np.testing.assert_array_equal(np.asarray(s_p), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(h_p), np.asarray(h_ref))


def test_packed_pad_rows_dropped(input_dir):
    motif = load_motifs(str(input_dir / "MA0139.1.meme"), UNIF, 0.1, False)[0]
    codes = np.zeros((4, 19), dtype=np.uint8)
    codes[3, :] = PAD_CODE
    pwm = pwms_to_flat([motif.score_matrix])
    mins = np.array([motif.min_score], dtype=np.int32)
    hs = hist_size_for_width(19)
    packed, flags = pack_codes(codes)
    s, h = score_and_histogram_packed(packed, flags, pwm, mins, 19, hs)
    assert int(np.asarray(s)[3, 0]) == -1
    assert int(np.asarray(h).sum()) == 3
