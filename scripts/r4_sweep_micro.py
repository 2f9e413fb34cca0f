"""Microbench sweep-kernel variants: all rays bound to one resident chunk.

Isolates the per-(tile, chunk-visit) cost from binning/selection: every ray
tile sweeps the same 512-triangle page, so time/tiles = cost of one visit.

Variants:
  base      : current _sweep_pass (VMEM page scratch, (8,128) tiles,
              fori row loop)
  unroll    : row loop unrolled by 8
  smem      : page DMA'd HBM->SMEM, tri fields read as SMEM scalars
  big       : (32,128) ray tiles
  smem+big  : both
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
RAY_EPS = 1e-4
BIG = 3.0e38
CHUNK_TRIS = 512
TRI_ROWS = CHUNK_TRIS // 8


def leaf0(out):
    return jax.tree_util.tree_leaves(out)[0]


def fetch(x):
    return float(np.asarray(jax.jit(jnp.sum)(x.ravel()[:8].astype(jnp.float32))))


def bench(name, fn, *args, reps=10):
    out = fn(*args)
    fetch(leaf0(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(leaf0(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:8.2f} ms", flush=True)
    return dt


def _woop(tri12, prim, rox, roy, roz, rdx, rdy, rdz, bt, bp):
    (a0x, a0y, a0z, a1x, a1y, a1z, a2x, a2y, a2z, cx, cy, cz) = tri12
    rz = a2x * rdx + a2y * rdy + a2z * rdz
    rz_ok = jnp.abs(rz) > 1e-12
    sz = a2x * rox + a2y * roy + a2z * roz - cz
    tt = -sz / jnp.where(rz_ok, rz, 1.0)
    rx = a0x * rdx + a0y * rdy + a0z * rdz
    sx = a0x * rox + a0y * roy + a0z * roz - cx
    u = sx + tt * rx
    ry = a1x * rdx + a1y * rdy + a1z * rdz
    sy = a1x * rox + a1y * roy + a1z * roz - cy
    v = sy + tt * ry
    hit = (rz_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
           & (tt > RAY_EPS) & (tt < bt))
    return jnp.where(hit, tt, bt), jnp.where(hit, prim, bp)


def make_variant(sublanes, smem_page, unroll):
    TILE = sublanes * LANES

    def kernel(pages_ref, ox, oy, oz, dx, dy, dz, limit,
               bt_ref, bp_ref, page_scr, sem):
        rox, roy, roz = ox[...], oy[...], oz[...]
        rdx, rdy, rdz = dx[...], dy[...], dz[...]
        cp = pltpu.make_async_copy(pages_ref.at[0], page_scr, sem)
        cp.start()
        cp.wait()
        bt = limit[...]
        bp = jnp.full((sublanes, LANES), -1, jnp.int32)

        if smem_page:
            def row(g, carry):
                bt, bp = carry
                for kk in range(8):
                    t = g * 8 + kk
                    tri12 = tuple(page_scr[t, r] for r in range(9)) + \
                        tuple(page_scr[t, 10 + r] for r in range(3))
                    prim = page_scr[t, 9].astype(jnp.int32)
                    bt, bp = _woop(tri12, prim, rox, roy, roz,
                                   rdx, rdy, rdz, bt, bp)
                return bt, bp
        else:
            def row(g, carry):
                bt, bp = carry
                blk = page_scr[pl.ds(g, 1), :]
                for kk in range(8):
                    base = 16 * kk
                    tri12 = tuple(blk[0, base + r] for r in range(9)) + \
                        tuple(blk[0, base + 10 + r] for r in range(3))
                    prim = blk[0, base + 9].astype(jnp.int32)
                    bt, bp = _woop(tri12, prim, rox, roy, roz,
                                   rdx, rdy, rdz, bt, bp)
                return bt, bp

        bt, bp = jax.lax.fori_loop(0, TRI_ROWS, row, (bt, bp),
                                   unroll=unroll)
        bt_ref[...] = bt
        bp_ref[...] = bp

    def spec():
        return pl.BlockSpec((sublanes, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def run(pages, ox, oy, oz, dx, dy, dz, limit):
        rows = ox.shape[0]
        grid = (rows // sublanes,)
        if smem_page:
            scr = pltpu.SMEM((CHUNK_TRIS, 16), jnp.float32)
            pg = pages.reshape(pages.shape[0], CHUNK_TRIS, 16)
        else:
            scr = pltpu.VMEM((TRI_ROWS, 128), jnp.float32)
            pg = pages
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [spec()] * 7,
            out_specs=(spec(), spec()),
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            ),
            scratch_shapes=[scr, pltpu.SemaphoreType.DMA],
        )(pg, ox, oy, oz, dx, dy, dz, limit)

    return jax.jit(run)


def main():
    jax.jit(lambda x: jax.lax.fori_loop(0, 2, lambda i, a: a + 1.0, x).sum())(
        jnp.ones((128,))).block_until_ready()

    N = 1 << 20
    rng = np.random.RandomState(0)
    # one chunk of 512 random triangles near the origin
    v0 = rng.uniform(-1, 1, (CHUNK_TRIS, 3)).astype(np.float32)
    e1 = rng.uniform(-0.1, 0.1, (CHUNK_TRIS, 3)).astype(np.float32)
    e2 = rng.uniform(-0.1, 0.1, (CHUNK_TRIS, 3)).astype(np.float32)
    sys.path.insert(0, ".")
    from mitransient_tpu.ops.accel import woop_records
    a, c = woop_records(v0, e1, e2)
    tri16 = np.zeros((CHUNK_TRIS, 16), np.float32)
    tri16[:, 0:9] = a.reshape(-1, 9)
    tri16[:, 9] = np.arange(CHUNK_TRIS)
    tri16[:, 10:13] = c
    pages = jnp.asarray(tri16.reshape(1, TRI_ROWS, 128))

    o = rng.uniform(-2, 2, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)

    results = {}
    for name, sub, smem, unroll in (
        ("base  (8,vmem,u1)", 8, False, 1),
        ("unroll(8,vmem,u8)", 8, False, 8),
        ("smem  (8,smem,u1)", 8, True, 1),
        ("big   (32,vmem,u1)", 32, False, 1),
        ("sm+big(32,smem,u1)", 32, True, 1),
        ("sm+big(32,smem,u4)", 32, True, 4),
        ("sm+huge(128,smem,u1)", 128, True, 1),
    ):
        TILE = sub * LANES
        npad = (N + TILE - 1) // TILE * TILE
        def padr(x, fill):
            return jnp.concatenate(
                [jnp.asarray(x), jnp.full((npad - N,), fill, jnp.float32)]
            ).reshape(-1, LANES)
        args = (pages,
                padr(o[:, 0], 0), padr(o[:, 1], 0), padr(o[:, 2], 0),
                padr(d[:, 0], 0), padr(d[:, 1], 0), padr(d[:, 2], 1),
                padr(np.full(N, BIG, np.float32), -BIG))
        try:
            fn = make_variant(sub, smem, unroll)
            dt = bench(name, fn, *args)
            results[name] = dt
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # cross-check correctness of the best variants vs base
    base = make_variant(8, False, 1)
    for name, sub, smem, unroll in (("smem", 8, True, 1),
                                    ("big", 32, False, 1)):
        TILE = sub * LANES
        npad = (N + TILE - 1) // TILE * TILE
        def padr(x, fill):
            return jnp.concatenate(
                [jnp.asarray(x), jnp.full((npad - N,), fill, jnp.float32)]
            ).reshape(-1, LANES)
        args = (pages,
                padr(o[:, 0], 0), padr(o[:, 1], 0), padr(o[:, 2], 0),
                padr(d[:, 0], 0), padr(d[:, 1], 0), padr(d[:, 2], 1),
                padr(np.full(N, BIG, np.float32), -BIG))
        try:
            fn = make_variant(sub, smem, unroll)
            bt, bp = fn(*args)
            bt0, bp0 = base(*args[:1] + tuple(
                a.reshape(-1, LANES) for a in args[1:]))
            same = np.array_equal(np.asarray(bp).ravel()[:N],
                                  np.asarray(bp0).ravel()[:N])
            print(f"{name} matches base: {same}", flush=True)
        except Exception as e:
            print(f"{name} check FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
