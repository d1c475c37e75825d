"""Pallas Myers kernel vs the jnp engine (ops/myers.py) — bit-identical
(best, end) on mixed streams; interpreter mode always, real chip under
GWA_TEST_TPU=1."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from genome_weaver_align_tpu.ops import myers, myers_pallas
from tests.streams import mixed_stream as _mixed_stream


@pytest.mark.parametrize(
    "S,L,W,k", [(600, 100, 112, 2), (300, 150, 174, 4), (64, 33, 60, 1), (128, 256, 280, 3)]
)
def test_pallas_matches_jnp(S, L, W, k):
    rng = np.random.default_rng(S + L)
    reads, lens, wins = _mixed_stream(rng, S, L, W, k)
    nwords = -(-L // 32)
    want_b, want_e = myers.myers_semiglobal_end(
        jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(wins), nwords
    )
    got_b, got_e = myers_pallas.myers_semiglobal_pallas(
        jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(wins), interpret=True,
        lanes=128,
    )
    assert np.array_equal(np.asarray(want_b), np.asarray(got_b))
    assert np.array_equal(np.asarray(want_e), np.asarray(got_e))


def test_pallas_matches_jnp_nonmultiple_batch():
    """Q not a lane multiple; W not an 8-multiple."""
    rng = np.random.default_rng(0)
    reads, lens, wins = _mixed_stream(rng, 133, 70, 83, 2)
    want_b, want_e = myers.myers_semiglobal_end(
        jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(wins), 3
    )
    got_b, got_e = myers_pallas.myers_semiglobal_pallas(
        jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(wins), interpret=True,
        lanes=128,
    )
    assert np.array_equal(np.asarray(want_b), np.asarray(got_b))
    assert np.array_equal(np.asarray(want_e), np.asarray(got_e))


@pytest.mark.skipif(
    os.environ.get("GWA_TEST_TPU") != "1",
    reason="hardware-gated: set GWA_TEST_TPU=1 with a real TPU attached",
)
def test_pallas_on_tpu_hardware():
    """Mosaic-compiled run on the real chip, production lane width."""
    rng = np.random.default_rng(1)
    reads, lens, wins = _mixed_stream(rng, 2048, 100, 112, 2)
    want_b, want_e = myers.myers_semiglobal_end(
        jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(wins), 4
    )
    got_b, got_e = myers_pallas.myers_semiglobal_pallas(
        jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(wins)
    )
    assert np.array_equal(np.asarray(want_b), np.asarray(got_b))
    assert np.array_equal(np.asarray(want_e), np.asarray(got_e))
