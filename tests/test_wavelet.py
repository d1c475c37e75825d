"""Wavelet-matrix rank vs. naive counting and vs. the occ table."""

import numpy as np
import pytest

from genome_weaver_align_tpu.index.wavelet import WaveletRank


@pytest.mark.parametrize("n,seed", [(1, 0), (63, 1), (128, 2), (1000, 3), (5000, 4)])
def test_wavelet_rank_vs_naive(n, seed):
    codes = np.random.default_rng(seed).integers(0, 4, size=n, dtype=np.uint8)
    w = WaveletRank(codes)
    ks = np.arange(n + 1)
    for c in range(4):
        expect = np.concatenate([[0], np.cumsum(codes == c)])
        got = w.rank(c, ks)
        assert np.array_equal(got, expect), f"c={c}"


def test_wavelet_matches_occ_table():
    from genome_weaver_align_tpu.index.build import build_fm_index
    from genome_weaver_align_tpu.utils import packing

    codes = np.random.default_rng(9).integers(0, 4, size=3000, dtype=np.uint8)
    fm = build_fm_index(codes)
    bwt = packing.unpack(fm.bwt_words, fm.n)
    w = WaveletRank(bwt)
    ks = np.random.default_rng(1).integers(0, fm.n + 1, size=200)
    for c in range(4):
        assert np.array_equal(w.rank(c, ks), fm.occ_packed(c, ks))
