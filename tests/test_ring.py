"""Explicit-RDMA ring all-reduce (parallel/ring.py) vs jax.lax.psum.

The kernel runs in Pallas TPU *interpret* mode on the virtual CPU mesh —
the interpreter simulates per-device semaphores and remote DMAs, including
the flow-control races the double-buffered ring must survive (SURVEY.md
§5.8; VERDICT r2 missing-#4).  A hardware-gated smoke test compiles the
same kernel via Mosaic on the real chip (ring of 1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from genome_weaver_align_tpu.parallel import ring


def _mesh(n):
    # interpret-mode tests ALWAYS use CPU devices: the TPU interpreter
    # simulates the RDMA machinery on the host, and running it against a
    # real-TPU mesh (GWA_TEST_TPU=1 suite) wedges the backend — the two
    # *_on_hardware tests below are the only ones that touch the chip
    try:
        devs = jax.devices("cpu")
    except RuntimeError:
        devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"need {n} devices, have {len(devs)}")
    return jax.make_mesh((n,), ("i",), devices=devs[:n])


def _run_ring(mesh, x, **kw):
    def f(xs):
        return ring.ring_psum(xs[0], "i", interpret=True, **kw)[None]

    fn = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=(P("i"),), out_specs=P("i"), check_vma=False)
    )
    return np.asarray(fn(x))


@pytest.mark.parametrize("n", [1, 2, 3, 4, 8])
def test_ring_psum_matches_psum(n):
    mesh = _mesh(n)
    rng = np.random.default_rng(n)
    x = rng.integers(-(1 << 20), 1 << 20, size=(n, 777), dtype=np.int32)
    got = _run_ring(mesh, x)
    want = x.sum(axis=0, dtype=np.int64).astype(np.int32)
    for d in range(n):
        assert np.array_equal(got[d], want)


def test_ring_psum_shapes_and_dtypes():
    """Non-tile-multiple sizes, 2D/3D operands, tiny vectors."""
    mesh = _mesh(4)
    rng = np.random.default_rng(0)
    for shape in [(3,), (2, 5), (1024,), (2, 3, 7)]:
        x = rng.integers(-1000, 1000, size=(4,) + shape, dtype=np.int32)
        got = _run_ring(mesh, x)
        want = x.sum(axis=0)
        for d in range(4):
            assert np.array_equal(got[d], want), shape


def test_ring_psum_race_free():
    """The interpreter's vector-clock race detector over the full
    double-buffer + capacity-semaphore protocol."""
    from jax.experimental.pallas import tpu as pltpu

    mesh = _mesh(4)
    x = np.arange(4 * 256, dtype=np.int32).reshape(4, 256)

    def f(xs):
        return ring.ring_psum(
            xs[0], "i", interpret=pltpu.InterpretParams(detect_races=True)
        )[None]

    fn = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=(P("i"),), out_specs=P("i"), check_vma=False)
    )
    got = np.asarray(fn(x))
    assert np.array_equal(got[0], x.sum(axis=0))


def test_sharded_search_ring_merge_and_microbatch():
    """make_sharded_exact_search with merge='ring' + microbatch=2 returns
    the same (lo, hi, pos) as the default psum path on the same index."""
    from genome_weaver_align_tpu.index.build import build_fm_index
    from genome_weaver_align_tpu.parallel import mesh as pmesh
    from genome_weaver_align_tpu.parallel import sharded_index as si

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("need 4 devices")
    m = pmesh.make_mesh(n_data=2, n_interval=2, devices=devs[:4])

    rng = np.random.default_rng(7)
    codes = rng.integers(0, 4, size=2048, dtype=np.uint8)
    fm = build_fm_index(codes, sample_rate=16)
    B, L = 16, 20
    starts = rng.integers(0, codes.size - L, size=B)
    reads = np.stack([codes[s : s + L] for s in starts]).astype(np.int32)
    lengths = np.full(B, L, np.int32)

    sh = si.shard_fm_index(fm, 2)
    sh = si.put_sharded(sh, m, pmesh.INTERVAL_AXIS)
    r, l, _ = pmesh.shard_reads(m, reads, lengths)

    base_fn = si.make_sharded_exact_search(
        m, pmesh.INTERVAL_AXIS, pmesh.DATA_AXIS, max_len=L, like=sh
    )
    ring_fn = si.make_sharded_exact_search(
        m, pmesh.INTERVAL_AXIS, pmesh.DATA_AXIS, max_len=L, like=sh,
        merge="ring", microbatch=2, ring_interpret=True,
    )
    lo0, hi0, pos0 = (np.asarray(v)[:B] for v in base_fn(sh, r, l))
    lo1, hi1, pos1 = (np.asarray(v)[:B] for v in ring_fn(sh, r, l))
    assert np.array_equal(lo0, lo1)
    assert np.array_equal(hi0, hi1)
    assert np.array_equal(pos0, pos1)
    assert all(codes[p : p + L].astype(np.int32).tolist() == reads[i].tolist()
               for i, p in enumerate(pos0))


@pytest.mark.parametrize("n,M", [(1, 2), (2, 2), (4, 2), (4, 3), (8, 2)])
def test_fused_rank_ring_matches_psum_of_local_occ(n, M):
    """fused_rank_ring == psum(local_occ_codes) bit-exactly, per payload."""
    from genome_weaver_align_tpu.index.build import build_fm_index
    from genome_weaver_align_tpu.parallel import sharded_index as si

    mesh = _mesh(n)
    rng = np.random.default_rng(3 * n + M)
    codes_txt = rng.integers(0, 4, size=1500, dtype=np.uint8)
    fm = build_fm_index(codes_txt, sample_rate=16)
    sh = si.shard_fm_index(fm, n)
    sh_dev = si.put_sharded(sh, mesh, "i")

    Q = 96  # deliberately not a lane multiple — exercises padding
    qk = rng.integers(0, fm.n + 1, size=(M, Q)).astype(np.int32)
    qc = rng.integers(0, 4, size=(M, Q)).astype(np.int32)

    def f(shl):
        shl = si.squeeze_local(shl)
        outs = []
        want = []
        for m in range(M):
            want.append(
                jax.lax.psum(
                    si.local_occ_codes(shl, jnp.asarray(qc[m]), jnp.asarray(qk[m])),
                    "i",
                )
            )
        g = [si.local_occ_gather(shl, jnp.asarray(qc[m]), jnp.asarray(qk[m]))
             for m in range(M)]
        got = ring.fused_rank_ring(
            jnp.stack([x[0] for x in g]),
            jnp.asarray(qc),
            jnp.stack([x[1] for x in g]),
            jnp.stack([x[2] for x in g]),
            jnp.stack([x[3] for x in g]),
            "i", interpret=True,
        )
        return got[None], jnp.stack(want)[None]

    fn = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=(si.index_specs("i", sh),),
            out_specs=(P("i"), P("i")), check_vma=False,
        )
    )
    got, want = (np.asarray(v) for v in fn(sh_dev))
    for d in range(n):
        assert np.array_equal(got[d], want[d]), (n, M, d)


def test_sharded_search_fused_merge():
    """merge='fused' returns the same (lo, hi, pos) as the psum path."""
    from genome_weaver_align_tpu.index.build import build_fm_index
    from genome_weaver_align_tpu.parallel import mesh as pmesh
    from genome_weaver_align_tpu.parallel import sharded_index as si

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("need 4 devices")
    m = pmesh.make_mesh(n_data=2, n_interval=2, devices=devs[:4])

    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=2048, dtype=np.uint8)
    fm = build_fm_index(codes, sample_rate=16)
    B, L = 16, 20
    starts = rng.integers(0, codes.size - L, size=B)
    reads = np.stack([codes[s : s + L] for s in starts]).astype(np.int32)
    lengths = np.full(B, L, np.int32)

    sh = si.shard_fm_index(fm, 2)
    sh = si.put_sharded(sh, m, pmesh.INTERVAL_AXIS)
    r, l, _ = pmesh.shard_reads(m, reads, lengths)

    base_fn = si.make_sharded_exact_search(
        m, pmesh.INTERVAL_AXIS, pmesh.DATA_AXIS, max_len=L, like=sh
    )
    fused_fn = si.make_sharded_exact_search(
        m, pmesh.INTERVAL_AXIS, pmesh.DATA_AXIS, max_len=L, like=sh,
        merge="fused", microbatch=2, ring_interpret=True,
    )
    lo0, hi0, pos0 = (np.asarray(v)[:B] for v in base_fn(sh, r, l))
    lo1, hi1, pos1 = (np.asarray(v)[:B] for v in fused_fn(sh, r, l))
    assert np.array_equal(lo0, lo1)
    assert np.array_equal(hi0, hi1)
    assert np.array_equal(pos0, pos1)


@pytest.mark.skipif(
    __import__("os").environ.get("GWA_TEST_TPU") != "1",
    reason="hardware-gated: set GWA_TEST_TPU=1 with a real TPU attached",
)
def test_ring_psum_compiles_on_hardware():
    """Mosaic-compile the RDMA kernel on the real chip.  With one chip the
    ring degenerates to a copy, but the kernel (semaphores, barrier,
    collective_id plumbing) must compile and run."""
    devs = [d for d in jax.devices() if d.platform != "cpu"]
    if not devs:
        pytest.skip("no TPU attached")
    mesh = jax.make_mesh((1,), ("i",), devices=devs[:1])
    x = np.arange(512, dtype=np.int32).reshape(1, 512)

    def f(xs):
        return ring.ring_psum(xs[0], "i")[None]

    fn = jax.jit(
        jax.shard_map(f, mesh=mesh, in_specs=(P("i"),), out_specs=P("i"), check_vma=False)
    )
    got = np.asarray(fn(x))
    assert np.array_equal(got[0], x[0])


@pytest.mark.skipif(
    __import__("os").environ.get("GWA_TEST_TPU") != "1",
    reason="hardware-gated: set GWA_TEST_TPU=1 with a real TPU attached",
)
def test_fused_rank_ring_compiles_on_hardware():
    """Mosaic-compile the fused rank+ring kernel on the real chip (ring of
    1: no RDMA, but the popcount rank compute + semaphore plumbing must
    compile) and check the rank result against the jnp oracle."""
    from genome_weaver_align_tpu.index.build import build_fm_index
    from genome_weaver_align_tpu.parallel import sharded_index as si

    devs = [d for d in jax.devices() if d.platform != "cpu"]
    if not devs:
        pytest.skip("no TPU attached")
    mesh = jax.make_mesh((1,), ("i",), devices=devs[:1])

    rng = np.random.default_rng(5)
    codes_txt = rng.integers(0, 4, size=1500, dtype=np.uint8)
    fm = build_fm_index(codes_txt, sample_rate=16)
    sh = si.shard_fm_index(fm, 1)
    sh_dev = si.put_sharded(sh, mesh, "i")
    M, Q = 2, 256
    qk = rng.integers(0, fm.n + 1, size=(M, Q)).astype(np.int32)
    qc = rng.integers(0, 4, size=(M, Q)).astype(np.int32)

    def f(shl):
        shl = si.squeeze_local(shl)
        want = jnp.stack([
            si.local_occ_codes(shl, jnp.asarray(qc[m]), jnp.asarray(qk[m]))
            for m in range(M)
        ])
        g = [si.local_occ_gather(shl, jnp.asarray(qc[m]), jnp.asarray(qk[m]))
             for m in range(M)]
        got = ring.fused_rank_ring(
            jnp.stack([x[0] for x in g]),
            jnp.asarray(qc),
            jnp.stack([x[1] for x in g]),
            jnp.stack([x[2] for x in g]),
            jnp.stack([x[3] for x in g]),
            "i",
        )
        return got[None], want[None]

    fn = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=(si.index_specs("i", sh),),
            out_specs=(P("i"), P("i")), check_vma=False,
        )
    )
    got, want = (np.asarray(v) for v in fn(sh_dev))
    assert np.array_equal(got[0], want[0])
