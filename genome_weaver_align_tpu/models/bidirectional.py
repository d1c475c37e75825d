"""Bidirectional BWT search (SURVEY.md §2 #9; reference `BidirectionalBWT`).

Maintains synchronized SA intervals in the forward-text index (for pattern P)
and the reverse-text index (for rev(P)), so P can be extended by one
character on either side (Lam et al. 2BWT).  Update rule for backward
extension P -> cP on the forward index:

    cnt[a]  = occ$(a, hi) - occ$(a, lo)          (all four codes, one pass)
    s       = [lo <= primary < hi]               ($ sorts before every base:
                                                  the occurrence of P at text
                                                  position 0 cannot extend)
    lo'     = C[c] + occ$(c, lo);   hi' = lo' + cnt[c]
    rlo'    = rlo + s + sum_{a<c} cnt[a];  rhi' = rlo' + cnt[c]

Forward extension P -> Pc is the mirror image with the two indexes swapped.
Both a NumPy oracle (over ``FMIndexData``) and the batched device version
(over ``DeviceFMIndex``) live here; tests pin them against naive search.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..index.build import FMIndexData
from ..ops import rank
from ..ops.rank import DeviceFMIndex


class BiInterval(NamedTuple):
    """Synchronized interval pair; arrays of any (broadcastable) shape."""

    lo: jax.Array | np.ndarray
    hi: jax.Array | np.ndarray
    rlo: jax.Array | np.ndarray
    rhi: jax.Array | np.ndarray

    @property
    def width(self):
        return self.hi - self.lo


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DeviceBiIndex:
    fwd: DeviceFMIndex
    rev: DeviceFMIndex


def from_host_bi(fwd: FMIndexData, rev: FMIndexData) -> DeviceBiIndex:
    return DeviceBiIndex(rank.from_host(fwd), rank.from_host(rev))


# ---------------------------------------------------------------- device

def init_interval(n: int, shape=()) -> BiInterval:
    z = jnp.zeros(shape, jnp.int32)
    f = jnp.full(shape, n + 1, jnp.int32)
    return BiInterval(z, f, z.copy(), f.copy())


def extend_backward(bi: DeviceBiIndex, st: BiInterval, c: jax.Array) -> BiInterval:
    """P -> cP.  c int32 codes, same shape as the interval arrays."""
    occ_lo = rank.occ_all4(bi.fwd, st.lo)
    occ_hi = rank.occ_all4(bi.fwd, st.hi)
    cnt = occ_hi - occ_lo  # (..., 4)
    p = bi.fwd.primary
    s = ((st.lo <= p) & (p < st.hi)).astype(jnp.int32)
    pref = jnp.cumsum(cnt, axis=-1) - cnt  # exclusive prefix over codes
    c_ = c[..., None].astype(jnp.int32)
    below = jnp.take_along_axis(pref, c_, axis=-1)[..., 0]
    cc = jnp.take_along_axis(cnt, c_, axis=-1)[..., 0]
    lo2 = bi.fwd.C[c.astype(jnp.int32)] + jnp.take_along_axis(occ_lo, c_, axis=-1)[..., 0]
    rlo2 = st.rlo + s + below
    return BiInterval(lo2, lo2 + cc, rlo2, rlo2 + cc)


def extend_forward(bi: DeviceBiIndex, st: BiInterval, c: jax.Array) -> BiInterval:
    """P -> Pc (character update on the reverse-text index, forward synced)."""
    occ_rlo = rank.occ_all4(bi.rev, st.rlo)
    occ_rhi = rank.occ_all4(bi.rev, st.rhi)
    cnt = occ_rhi - occ_rlo
    p = bi.rev.primary
    s = ((st.rlo <= p) & (p < st.rhi)).astype(jnp.int32)
    pref = jnp.cumsum(cnt, axis=-1) - cnt
    c_ = c[..., None].astype(jnp.int32)
    below = jnp.take_along_axis(pref, c_, axis=-1)[..., 0]
    cc = jnp.take_along_axis(cnt, c_, axis=-1)[..., 0]
    rlo2 = bi.rev.C[c.astype(jnp.int32)] + jnp.take_along_axis(occ_rlo, c_, axis=-1)[..., 0]
    lo2 = st.lo + s + below
    return BiInterval(lo2, lo2 + cc, rlo2, rlo2 + cc)


def _occ_all4_pair(fm, a: jax.Array, b: jax.Array):
    """occ_all4 at two coordinate tensors via ONE stacked row gather.

    The staircase's sequential extension steps are gather-latency priced
    (each step waits on its occ rows before the next), so folding the
    lo/hi lookups into a single wider gather halves the dependent gather
    rounds per step — the same trick ``rank.backward_step`` uses."""
    both = rank.occ_all4(fm, jnp.stack([a, b], axis=0))
    return both[0], both[1]


def extend_backward_all4(bi: DeviceBiIndex, st: BiInterval) -> BiInterval:
    """All four backward extensions at once: result arrays get a trailing
    axis of size 4 (used by branching approximate search)."""
    occ_lo, occ_hi = _occ_all4_pair(bi.fwd, st.lo, st.hi)
    cnt = occ_hi - occ_lo
    p = bi.fwd.primary
    s = ((st.lo <= p) & (p < st.hi)).astype(jnp.int32)[..., None]
    pref = jnp.cumsum(cnt, axis=-1) - cnt
    lo2 = bi.fwd.C[:4] + occ_lo
    rlo2 = st.rlo[..., None] + s + pref
    return BiInterval(lo2, lo2 + cnt, rlo2, rlo2 + cnt)


def extend_forward_all4(bi: DeviceBiIndex, st: BiInterval) -> BiInterval:
    occ_rlo, occ_rhi = _occ_all4_pair(bi.rev, st.rlo, st.rhi)
    cnt = occ_rhi - occ_rlo
    p = bi.rev.primary
    s = ((st.rlo <= p) & (p < st.rhi)).astype(jnp.int32)[..., None]
    pref = jnp.cumsum(cnt, axis=-1) - cnt
    rlo2 = bi.rev.C[:4] + occ_rlo
    lo2 = st.lo[..., None] + s + pref
    return BiInterval(lo2, lo2 + cnt, rlo2, rlo2 + cnt)


# ---------------------------------------------------------------- host oracle

class HostBiIndex:
    def __init__(self, fwd: FMIndexData, rev: FMIndexData):
        assert fwd.n == rev.n
        self.fwd, self.rev = fwd, rev

    def init(self) -> tuple[int, int, int, int]:
        n = self.fwd.n
        return (0, n + 1, 0, n + 1)

    def _ext(self, main: FMIndexData, mlo, mhi, olo, c):
        cnt = np.array([int(main.occ(a, mhi)[0] - main.occ(a, mlo)[0]) for a in range(4)])
        s = 1 if mlo <= main.primary < mhi else 0
        below = int(cnt[:c].sum())
        mlo2 = int(main.C[c] + main.occ(c, mlo)[0])
        olo2 = olo + s + below
        return mlo2, mlo2 + int(cnt[c]), olo2, olo2 + int(cnt[c])

    def extend_backward(self, st, c):
        lo, hi, rlo, rhi = st
        lo2, hi2, rlo2, rhi2 = self._ext(self.fwd, lo, hi, rlo, c)
        return (lo2, hi2, rlo2, rhi2)

    def extend_forward(self, st, c):
        lo, hi, rlo, rhi = st
        rlo2, rhi2, lo2, hi2 = self._ext(self.rev, rlo, rhi, lo, c)
        return (lo2, hi2, rlo2, rhi2)
