"""Pallas TPU kernel for Myers bit-parallel semi-global edit distance.

The reference's core verify primitive is bit-parallel Myers over ``long[]``
(SURVEY.md §2 #11, `BitParallelSwithWaterman.align64`); ``ops/myers.py`` is
its jnp twin.  This kernel is the speed-of-light version: one window
character costs ~50 full-tile VPU ops for **256 DP cells** (8 uint32 words
x 32 bits on the sublane axis), independent of k — vs ~20 ops *per cell*
for the banded wavefront kernel (``ops/dp_pallas.py``), whose cost also
grows with the band.  For the production threshold regime (keep dist <= k,
k <= 2k-band) the two engines agree exactly: any <=k-edit alignment stays
within the band, and larger distances are clamped by the caller.

Layout: candidates on the 128-lane axis (``LANES`` per grid program), the
8-word bit-vector state (PV/MV) on the sublane axis — a full (8, lanes)
vreg tile per op.  The multi-word ADD carry chain (the only serial part of
Myers) is a 3-step Kogge-Stone generate/propagate scan over the sublane
axis instead of a word-serial loop, so it also runs at full tile width.

Mosaic constraints (inherited from dp_pallas, found on real v5e):
- dynamic sublane slices must be 8-aligned -> window chars are consumed in
  aligned (8, lanes) chunks with static inner unroll.
- no unsigned vector compares -> add carry-out is computed with the bit
  majority identity ((a&b) | ((a|b) & ~s)) >> 31, and the all-ones
  propagate test bitcasts to i32 and compares == -1.

Bit-identical to ``ops.myers.myers_semiglobal_end`` (best, end) — asserted
in interpreter mode always and on hardware under GWA_TEST_TPU=1
(tests/test_myers_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import myers

LANES = 512
NW8 = 8  # state words per lane (sublane tile height); L <= 256
_STEP = 8
FULL = 0xFFFFFFFF  # plain int: a jnp scalar here would be a captured const


def _shd(x, d, lanes):
    """Shift rows down by d (row w sees row w-d); zeros shifted in."""
    return jnp.concatenate(
        [jnp.zeros((d, lanes), x.dtype), x[:-d, :]], axis=0
    )


def _addc(a, b, lanes):
    """Multi-word a + b over the sublane word chain, Kogge-Stone carries."""
    s = a + b
    # carry-out per word without unsigned compares: majority(a, b, ~s) bit 31
    g = ((a & b) | ((a | b) & ~s)) >> jnp.uint32(31)
    # propagate: word saturated, an incoming carry ripples through
    p = (pltpu.bitcast(s, jnp.int32) == -1).astype(jnp.uint32)
    # inclusive scan of (g, p): G[w] = carry out of words 0..w given cin 0
    for d in (1, 2, 4):
        g = g | (p & _shd(g, d, lanes))
        p = p & _shd(p, d, lanes)
    cin = _shd(g, 1, lanes)  # exclusive: carry INTO word w
    return s + cin


def _shl1(x, lanes):
    """(x << 1) across the word chain; zero enters bit 0 of word 0."""
    return (x << jnp.uint32(1)) | _shd(x >> jnp.uint32(31), 1, lanes)


def _kernel(eq_ref, lmask_ref, len_ref, win_ref, best_ref, end_ref, *, lanes, T):
    eqs = [eq_ref[pl.ds(c * NW8, NW8), :] for c in range(4)]  # 4x (8, lanes)
    lmask = lmask_ref[...]  # (8, lanes) u32
    lengths = len_ref[0, :]  # (lanes,) i32

    pv0 = jnp.full((NW8, lanes), FULL, jnp.uint32)
    mv0 = jnp.zeros((NW8, lanes), jnp.uint32)
    score0 = lengths[None, :]
    zero = jnp.uint32(0)

    def outer(t, state):
        pv, mv, score, best, end = state
        base = pl.multiple_of(t * _STEP, _STEP)
        wchunk = win_ref[pl.ds(base, _STEP), :]  # (8, lanes) i32
        basev = jnp.zeros((1, lanes), jnp.int32) + base

        for s in range(_STEP):
            wchar = wchunk[s, :][None, :]  # (1, lanes) i32
            peq = jnp.zeros((NW8, lanes), jnp.uint32)
            for c in range(4):
                peq = peq | jnp.where(wchar == c, eqs[c], zero)
            x0 = peq | mv
            d0 = (_addc(peq & pv, pv, lanes) ^ pv) | x0
            hn = pv & d0
            hp = mv | ~(pv | d0)
            up = jnp.sum(
                jnp.where(
                    pltpu.bitcast(hp & lmask, jnp.int32) != 0,
                    jnp.int32(1),
                    jnp.int32(0),
                ),
                axis=0,
                keepdims=True,
            )
            dn = jnp.sum(
                jnp.where(
                    pltpu.bitcast(hn & lmask, jnp.int32) != 0,
                    jnp.int32(1),
                    jnp.int32(0),
                ),
                axis=0,
                keepdims=True,
            )
            score = score + up - dn
            xs = _shl1(hp, lanes)
            mv = xs & d0
            pv = _shl1(hn, lanes) | ~(xs | d0)
            better = score < best
            end = jnp.where(better, basev + (s + 1), end)
            best = jnp.minimum(best, score)
        return pv, mv, score, best, end

    state0 = (pv0, mv0, score0, score0, jnp.zeros((1, lanes), jnp.int32))
    _, _, _, best, end = jax.lax.fori_loop(0, T, outer, state0)
    best_ref[0, :] = best[0, :]
    end_ref[0, :] = end[0, :]


@partial(jax.jit, static_argnames=("interpret", "lanes"))
def myers_semiglobal_pallas(
    reads: jax.Array,  # (Q, L) int codes; >=4 never matches
    lengths: jax.Array,  # (Q,)
    windows: jax.Array,  # (Q, W) int codes; >=4 never matches
    interpret: bool = False,
    lanes: int = LANES,
):
    """Drop-in for ``ops.myers.myers_semiglobal_end`` (best, end).

    Q is padded to a lane multiple; W to the 8-step chunk (pad code 4 has
    Peq 0, so pad steps can only raise the running score — best and the
    first-argmin end are unaffected, same argument as the jnp engine)."""
    Q, L = reads.shape
    W = windows.shape[1]
    if L > 32 * NW8:
        raise ValueError(f"read length {L} > {32 * NW8} unsupported")
    nwords = -(-L // 32)
    Qp = -(-Q // lanes) * lanes
    T = -(-W // _STEP)
    Wp = T * _STEP

    eq = myers.build_eq(reads.astype(jnp.int32), lengths.astype(jnp.int32), nwords)
    # (Q, 4, nwords) -> (4*8, Qp): plane-major rows, words zero-padded to 8
    eq8 = jnp.zeros((Q, 4, NW8), jnp.uint32).at[:, :, :nwords].set(eq)
    eqT = jnp.zeros((4 * NW8, Qp), jnp.uint32).at[:, :Q].set(
        jnp.transpose(eq8, (1, 2, 0)).reshape(4 * NW8, Q)
    )

    last = lengths.astype(jnp.int32) - 1
    word_idx = jnp.arange(NW8, dtype=jnp.int32)[:, None]
    lmaskT = jnp.zeros((NW8, Qp), jnp.uint32)
    lmaskT = lmaskT.at[:, :Q].set(
        jnp.where(
            word_idx == (last // 32)[None, :],
            jnp.uint32(1) << (last % 32).astype(jnp.uint32)[None, :],
            jnp.uint32(0),
        )
    )
    lenT = jnp.zeros((1, Qp), jnp.int32).at[0, :Q].set(lengths.astype(jnp.int32))
    winT = jnp.full((Wp, Qp), 4, jnp.int32).at[:W, :Q].set(
        windows.astype(jnp.int32).T
    )

    best, end = kernel_call(eqT, lmaskT, lenT, winT, lanes=lanes, interpret=interpret)
    return best[0, :Q], end[0, :Q]


@partial(jax.jit, static_argnames=("lanes", "interpret"))
def kernel_call(eqT, lmaskT, lenT, winT, *, lanes, interpret=False):
    """Bare pallas_call on pre-formatted inputs (see dp_pallas.kernel_call)."""
    Qp = winT.shape[1]
    T = winT.shape[0] // _STEP
    grid = (Qp // lanes,)
    return pl.pallas_call(
        partial(_kernel, lanes=lanes, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4 * NW8, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((NW8, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((winT.shape[0], lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(eqT, lmaskT, lenT, winT)
