"""Golden-file parity tests for the motif processing pipeline.

Mirrors the reference's ``test_motif_processing_{meme,jaspar,transfac,pfm}``
(``tests/grafimo_run_test.py:68-116``): the integer scaled score matrix built
from each of the four formats must equal the golden matrix bit-for-bit.
"""

import numpy as np
import pytest

from grafimo_tpu.models.parse import (
    load_motifs,
    parse_jaspar,
    parse_meme,
    parse_pfm,
    parse_transfac,
)
from grafimo_tpu.utils.constants import UNIF
from grafimo_tpu.utils.sniff import sniff_motif_format


@pytest.mark.parametrize(
    "fname,golden",
    [
        ("MA0139.1.meme", "motif_processing_test_meme.txt"),
        ("MA0139.1.jaspar", "motif_processing_test_jaspar.txt"),
        ("MA0139.1.transfac", "motif_processing_test_jaspar.txt"),
        ("MA0139.1.pfm", "motif_processing_test_jaspar.txt"),
    ],
)
def test_scaled_matrix_parity(input_dir, expected_dir, fname, golden):
    expected = np.loadtxt(expected_dir / golden).astype(int)
    motifs = load_motifs(
        str(input_dir / fname), UNIF, 0.1, no_reverse=False
    )
    assert len(motifs) == 1
    m = motifs[0]
    assert m.motif_id == "MA0139.1"
    assert m.motif_name == "CTCF"
    assert m.width == 19
    assert (m.score_matrix == expected).all()
    # scaling invariants used by the scoring kernel
    assert m.score_matrix.min() == m.min_score
    assert m.score_matrix.max() == m.max_score
    assert m.pval_table.shape == (1000 * 19 + 1,)
    assert m.pval_table.sum() > 0


def test_format_sniffers(input_dir):
    assert sniff_motif_format(str(input_dir / "MA0139.1.jaspar")) == "jaspar"
    assert sniff_motif_format(str(input_dir / "MA0139.1.meme")) == "meme"
    assert sniff_motif_format(str(input_dir / "MA0139.1.transfac")) == "transfac"
    assert sniff_motif_format(str(input_dir / "MA0139.1.pfm")) == "pfm"


def test_parsers_same_counts(input_dir):
    """JASPAR, TRANSFAC and PFM files of MA0139.1 carry identical counts."""
    j = parse_jaspar(str(input_dir / "MA0139.1.jaspar"))
    t = parse_transfac(str(input_dir / "MA0139.1.transfac"))
    p = parse_pfm(str(input_dir / "MA0139.1.pfm"))
    np.testing.assert_array_equal(j.counts, t.counts)
    np.testing.assert_array_equal(j.counts, p.counts)
    meme = parse_meme(str(input_dir / "MA0139.1.meme"))
    assert len(meme) == 1 and meme[0].nsites == 913


def test_no_reverse_changes_nothing_with_uniform_bg(input_dir):
    with_rc = load_motifs(str(input_dir / "MA0139.1.jaspar"), UNIF, 0.1, False)[0]
    without_rc = load_motifs(str(input_dir / "MA0139.1.jaspar"), UNIF, 0.1, True)[0]
    np.testing.assert_array_equal(with_rc.score_matrix, without_rc.score_matrix)
