"""Pallas TPU kernels + pass loop for large-scene ray queries.

Companion to ops/accel.py (see its docstring for the algorithm).  Replaces
the Embree/OptiX closest-hit / any-hit queries of the reference stack
(``scene.ray_intersect`` transientpath.py:149, ``scene.ray_test``
transientnlospath.py:442) for scenes beyond the single-level sweep's
4096-triangle SMEM cap.

Pipeline per pass (driven by ``lax.while_loop`` in :func:`closest_hit_bvh`):

1. ``_select_next`` (pure XLA, fully vectorized): every ray picks the
   chunk with the smallest AABB entry distance that is (a) closer than its
   current best hit and (b) lexicographically after its (entry, chunk)
   gate — i.e. front-to-back enumeration without any per-ray stack.
2. One ``lax.sort`` bins the wavefront by chosen chunk id.
3. ``_sweep_kernel``: one grid program per (SUBLANES, LANES) ray tile.
   The tile walks its *distinct* chunk ids (a handful, thanks to the sort)
   with a scalar while-loop; each page is DMA'd HBM->VMEM double-buffered
   and swept 8 triangles per 128-lane row — dynamic indices only ever touch
   the sublane dimension (Mosaic allows that; dynamic lane indices are
   rejected), and every triangle extract is static-lane.

Divergence is absorbed by binning + masked tile updates; all hot math is
dense VPU work on full tiles.  Tiles whose rays are all finished bin into a
sentinel id and cost one reduction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .accel import Accel, CHUNK_TRIS, SUPER_CHUNKS

LANES = 128
# 16-sublane ray tiles (2048 rays/program).  Bigger tiles amortize the
# sweep's per-triangle scalar extracts and row-loop overhead over more
# rays (one-chunk sweep micro, r4_sweep_micro: (8,128) no-unroll 25.5 ms
# -> (32,128) fully-unrolled 9.1 ms/1M rays) but dilute binning coherence
# (more distinct chunks per sorted tile).  Staircase end-to-end sweep
# (1M-ray synthetic): SUBLANES=8 1.96 / 16 2.61 / 32 2.18 Mrays/s
# incoherent (coherent 6.2 / 9.1 / 10.6) — 16 is the incoherent knee and
# wins end-to-end (1.16 vs 0.98 Mrays/s at 32).
SUBLANES = 16
TILE = LANES * SUBLANES
RAY_EPS = 1e-4
BIG = 3.0e38
# Page row count (8 triangles x 16 fields per 128-lane row) is derived per
# accel from pages.shape[1] — subtree-aligned chunks pad to a common cap
# that can exceed CHUNK_TRIS (ops/accel.py _subtree_ranges).
# Candidates emitted per SELECT (initial pick + in-kernel refills).  Round
# 3/4 measured K>1 as a 2x regression when each PASS swept K chunks per ray
# (candidate-2 cids scatter across the sorted tiles, blowing up the per-tile
# chunk unions).  Round 5 uses K=2 differently: each pass still consumes
# exactly ONE candidate (sort coherence preserved), but the second candidate
# rides the sorted state as a CACHE pair (entry, cid), halving how often the
# dense super/chunk selection scan runs — the scan is the largest per-pass
# cost (12.2 of 29.6 ms/1M rays, scripts/r5_phases.py).  The cache is exact:
# front-to-back entries are non-decreasing, so a cached candidate whose
# entry no longer beats the ray's best-t proves the ray is DONE, and one
# that does beat it is exactly what a fresh select would return.
SELECT_K = 2
# Rows (8 triangles each) swept per dynamic block: subtree-aligned chunks
# vary in size below the common page cap (staircase: mean fill 339 of 512
# tris — 34% dead rows), so the row loop runs ceil(used_rows/ROW_BLK)
# blocks of ROW_BLK statically-unrolled rows instead of the full cap.
ROW_BLK = 8

# Traversal mode: "chunk" = per-ray front-to-back CHUNK selection (one
# 512-tri page per pass), "super" = per-ray front-to-back SUPER-CHUNK
# selection (one pass sweeps all 8 contiguous chunk pages of the chosen
# super).  The super mode amortizes the dense selection scan (S slab tests
# instead of C = 8S per pick), the wavefront sort, and the pass fixed costs
# over 8 chunk visits — the "hierarchical chunk selection" planned in
# PARITY.md.  MEASURED on the 262k-tri staircase end-to-end (TPU v5e,
# round 4, identical output checksums): chunk 0.71 Mrays/s, super
# 0.61 Mrays/s — on incoherent bounce wavefronts the sorted tiles are
# nearly single-chunk, so the 8x sweep rows per super visit cost more
# than the 8x cheaper selection saves.  Default stays "chunk"; the super
# path is kept as the measured branch point for future hierarchy work.
BVH_MODE = "chunk"

# Alive-compaction cascade ladder: a stage hands off to a prefix of
# LADDER_NUM/LADDER_DEN of its size once the alive count fits, down to a
# floor of LADDER_FLOOR_TILES tiles.  Ratio 2 hands off at the median of
# the per-ray visit distribution; finer ratios trade more handoff sorts +
# compiled stages for less overwork on the tail.
LADDER_NUM = 1
LADDER_DEN = 2
LADDER_FLOOR_TILES = 4


def _pad_reshape(x, fill):
    n = x.shape[0]
    pad = (-n) % TILE
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x.reshape(-1, LANES)


def _ray_spec():
    return pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _safe_inv(d):
    tiny = jnp.where(d < 0.0, -1e-12, 1e-12)
    return 1.0 / jnp.where(jnp.abs(d) < 1e-12, tiny, d)


def _woop_update(tri12, prim, rox, roy, roz, rdx, rdy, rdz, mask,
                 best_t, best_p):
    """One ray-tile vs one triangle in the Woop unit-triangle form
    (accel.woop_records): ~33 VPU ops vs ~57 for Moller-Trumbore."""
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
    hit = (
        mask & rz_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (tt > RAY_EPS) & (tt < best_t)
    )
    best_p = jnp.where(hit, prim, best_p)
    best_t = jnp.where(hit, tt, best_t)
    return best_t, best_p


def _sweep_kernel(
    aabb_ref,                       # (8, C_pad) SMEM: rows 0-5 chunk
                                    # bounds, row 6 = used row-blocks
    sup_ref,                        # (8, S) SMEM super-chunk bounds
    pages_ref,                      # (C, tri_rows, 128) ANY (HBM); tri_rows = per-accel page cap // 8
    *refs,                          # cid + 7 ray + 2 cache + oidx tiles,
                                    # outs (t, p, c1, e2, c2), scratch, sem
    n_chunks: int,
    n_supers: int,
    tri_rows: int,
    n_closest: int,
):
    """Fused sweep + candidate-cache promote + K=2 refill select.

    Each pass consumes ONE chunk candidate per ray (the sorted cid tile),
    then advances the ray's front-to-back enumeration from a 1-deep cache
    pair carried in the sorted state:

    - cache (e2, c2) with c2 >= 0: a pre-selected next candidate.  If its
      entry still beats the post-sweep best-t it becomes the next cid;
      otherwise the ray is DONE (front-to-back entries are non-decreasing,
      so nothing later can improve either).  The consumed pair is re-encoded
      as the refill gate: (e2, -(c2+2)).
    - cache c2 <= -2: dry, holding the lex gate of the last emission — the
      dense super/chunk selection scan runs (with the post-sweep best-t,
      which prunes harder than any pre-sweep select) and emits the next TWO
      candidates.  The scan therefore runs every OTHER pass per ray, and
      tiles whose rays all hold cached candidates (or are finished) skip it
      entirely.
    - cache c2 == -1: no candidates remain; the ray is finished.

    Occlusion rays are identified positionally (oidx >= n_closest — merged
    wavefronts put closest-hit rays first, so no extra sorted array is
    needed): their best-t collapses to -BIG on any hit, which both ends
    their enumeration and signals the hit to the caller."""
    (cid_t, ox, oy, oz, dx, dy, dz, limit, e2_t, c2_t, oidx_t) = refs[:11]
    best_t_ref, best_p_ref, c1_out, e2_out, c2_out = refs[11:16]
    page_scr = refs[16]
    sem = refs[17]
    cids = cid_t[...]
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    ix, iy, iz = _safe_inv(rdx), _safe_inv(rdy), _safe_inv(rdz)
    lim = limit[...]
    sent = jnp.int32(n_chunks)

    def slab(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz):
        t0x = (bminx - rox) * ix
        t1x = (bmaxx - rox) * ix
        t0y = (bminy - roy) * iy
        t1y = (bmaxy - roy) * iy
        t0z = (bminz - roz) * iz
        t1z = (bmaxz - roz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), RAY_EPS),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        return tn, tf

    best_t_ref[...] = lim
    best_p_ref[...] = jnp.full((SUBLANES, LANES), -1, jnp.int32)

    def fetch(chunk, slot):
        return pltpu.make_async_copy(
            pages_ref.at[jnp.minimum(chunk, sent - 1)],
            page_scr.at[slot], sem.at[slot],
        )

    def tile_min_after(cur):
        return jnp.min(jnp.where(cids > cur, cids, sent))

    first = tile_min_after(jnp.int32(-1))

    @pl.when(first < sent)
    def _():
        fetch(first, 0).start()

    def body(carry):
        cur, slot = carry
        nxt = tile_min_after(cur)

        @pl.when(nxt < sent)
        def _():
            fetch(nxt, 1 - slot).start()

        fetch(cur, slot).wait()
        bt = best_t_ref[...]
        bp = best_p_ref[...]
        # Opportunistic mask: sweep EVERY ray in the tile that can improve
        # against this resident chunk (exact per-ray slab test), not just
        # the rays whose selection bound it.  Duplicate work is idempotent
        # (min-reduce) and the wider mask slashes the number of passes the
        # outer loop needs.
        tn, tf = slab(aabb_ref[0, cur], aabb_ref[1, cur], aabb_ref[2, cur],
                      aabb_ref[3, cur], aabb_ref[4, cur], aabb_ref[5, cur])
        bound = cids == cur
        mask = bound | ((tn <= tf) & (tn < bt))

        def blk(g, carry):
            bt, bp = carry
            for r in range(ROW_BLK):
                # the clamp covers caps not divisible by 8*ROW_BLK tris:
                # re-testing the last row is idempotent (strict < on t)
                gr = jnp.minimum(g * ROW_BLK + r, tri_rows - 1)
                blkrow = page_scr[slot, pl.ds(gr, 1), :]
                for kk in range(8):
                    base = 16 * kk
                    tri12 = tuple(blkrow[0, base + q] for q in range(9)) \
                        + tuple(blkrow[0, base + 10 + q] for q in range(3))
                    prim = blkrow[0, base + 9].astype(jnp.int32)
                    bt, bp = _woop_update(
                        tri12, prim, rox, roy, roz, rdx, rdy, rdz, mask,
                        bt, bp)
            return bt, bp

        # dynamic trip count = the chunk's used row-blocks (SMEM row 6);
        # the ROW_BLK statically-unrolled rows inside each block keep the
        # scalar triangle-field extracts overlapped with vector math.
        nblk = aabb_ref[6, cur].astype(jnp.int32)
        bt, bp = jax.lax.fori_loop(0, nblk, blk, (bt, bp))
        best_t_ref[...] = bt
        best_p_ref[...] = bp
        return nxt, 1 - slot

    jax.lax.while_loop(lambda s: s[0] < sent, body, (first, 0))

    # ---- occlusion collapse (positional: oidx >= n_closest) ------------
    bt = best_t_ref[...]
    bp = best_p_ref[...]
    occl = oidx_t[...] >= jnp.int32(n_closest)
    bt = jnp.where(occl & (bp >= 0), -BIG, bt)
    best_t_ref[...] = bt

    # ---- cache promote -------------------------------------------------
    e2v = e2_t[...]
    c2v = c2_t[...]
    valid2 = c2v >= 0.0
    take = valid2 & (e2v < bt)
    c1_out[...] = jnp.where(take, c2v.astype(jnp.int32), -1)
    e2_out[...] = e2v
    c2_out[...] = jnp.where(take, -(c2v + 3.0), -1.0)

    # ---- K=2 refill select (dry caches only; post-sweep best_t) --------
    # Gate encoding -(gc+3) puts every gate at <= -2 (gc=-1, the fresh-ray
    # gate, encodes as -2), keeping -1 free as the DONE sentinel — so a
    # fresh wavefront needs no standalone pick kernel: its first pass has
    # nothing bound and refills here, after the cascade has already had a
    # chance to compact dead lanes away.
    need = (c2v <= -2.0) & (bt > -BIG)

    @pl.when(jnp.any(need))
    def _():
        ge = e2v
        gc = -(c2v + 3.0)

        def sup_body(si, carry):
            be1, bc1, be2, bc2 = carry
            tn, tf = slab(sup_ref[0, si], sup_ref[1, si], sup_ref[2, si],
                          sup_ref[3, si], sup_ref[4, si], sup_ref[5, si])
            # packet pruning: a super matters only if some refilling ray
            # could still insert a chunk from it (gate-independent, safe)
            hit = jnp.any(need & (tn <= tf) & (tn < jnp.minimum(bt, be2)))

            def scan8(carry):
                be1, bc1, be2, bc2 = carry
                for k in range(SUPER_CHUNKS):
                    ci = si * SUPER_CHUNKS + k
                    tn, tf = slab(aabb_ref[0, ci], aabb_ref[1, ci],
                                  aabb_ref[2, ci], aabb_ref[3, ci],
                                  aabb_ref[4, ci], aabb_ref[5, ci])
                    cif = ci.astype(jnp.float32)
                    after = (tn > ge) | ((tn == ge) & (cif > gc))
                    valid = (tn <= tf) & (tn < bt) & after \
                        & (cif < jnp.float32(n_chunks)) & need
                    e = jnp.where(valid, tn, jnp.inf)
                    c = jnp.where(valid, cif, 1.0e30)
                    # bubble (e, c) through the two sorted register pairs
                    less = (e < be1) | ((e == be1) & (c < bc1))
                    ne = jnp.where(less, e, be1)
                    nc = jnp.where(less, c, bc1)
                    e = jnp.where(less, be1, e)
                    c = jnp.where(less, bc1, c)
                    be1, bc1 = ne, nc
                    less = (e < be2) | ((e == be2) & (c < bc2))
                    be2 = jnp.where(less, e, be2)
                    bc2 = jnp.where(less, c, bc2)
                return be1, bc1, be2, bc2

            return jax.lax.cond(hit, scan8, lambda c: c,
                                (be1, bc1, be2, bc2))

        shape = (SUBLANES, LANES)
        be1, bc1, be2, bc2 = jax.lax.fori_loop(
            0, n_supers, sup_body,
            (jnp.full(shape, jnp.inf, jnp.float32),
             jnp.full(shape, 1.0e30, jnp.float32),
             jnp.full(shape, jnp.inf, jnp.float32),
             jnp.full(shape, 1.0e30, jnp.float32)))
        f1 = jnp.isfinite(be1) & (bc1 < jnp.float32(n_chunks))
        f2 = jnp.isfinite(be2) & (bc2 < jnp.float32(n_chunks))
        g1 = jnp.where(f1, bc1.astype(jnp.int32), -1)
        e2_new = jnp.where(f2, be2, be1)
        c2_new = jnp.where(f2, bc2,
                           jnp.where(f1, -(bc1 + 3.0), -1.0))
        c1_out[...] = jnp.where(need, g1, c1_out[...])
        e2_out[...] = jnp.where(need, e2_new, e2_out[...])
        c2_out[...] = jnp.where(need, c2_new, c2_out[...])


def _sweep_pass(accel: Accel, cid, ray_o, ray_d, best_t, cache_e, cache_c,
                oidx, n_closest, interpret):
    """Run the fused sweep+promote+refill kernel over a (sorted) wavefront:
    each ray is tested against its bound chunk (plus any resident chunk it
    can improve against), then its next front-to-back candidate comes from
    the cache pair or a K=2 refill with the updated best_t.  Returns
    (t, prim, next_cid, next_cache_e, next_cache_c)."""
    n = ray_o.shape[0]
    n_chunks = accel.pages.shape[0]
    s_n = accel.sup_min.shape[0]
    c_pad = s_n * SUPER_CHUNKS
    tiles = (
        _pad_reshape(jnp.where(cid >= 0, cid, n_chunks), n_chunks),
        _pad_reshape(ray_o[:, 0], 0.0),
        _pad_reshape(ray_o[:, 1], 0.0),
        _pad_reshape(ray_o[:, 2], 0.0),
        _pad_reshape(ray_d[:, 0], 0.0),
        _pad_reshape(ray_d[:, 1], 0.0),
        _pad_reshape(ray_d[:, 2], 1.0),
        _pad_reshape(jnp.minimum(best_t, BIG), -BIG),
        _pad_reshape(cache_e, -jnp.inf),
        _pad_reshape(cache_c, -1.0),
        _pad_reshape(oidx, 0),
    )
    rows = tiles[0].shape[0]
    grid = (rows // SUBLANES,)
    nblk = jnp.ceil(accel.rows / float(ROW_BLK)).astype(jnp.float32)
    aabb_smem = jnp.concatenate(
        [accel.aabb_min.T, accel.aabb_max.T, nblk[None, :],
         jnp.zeros((1, n_chunks), jnp.float32)], axis=0)
    if c_pad > n_chunks:
        # pad chunks: unhittable bounds (min=+1 > max=-1 reorders into a
        # hittable box under slab min/max, but the select masks ci >=
        # n_chunks at the source; the opportunistic-mask slab only ever
        # sees cur < n_chunks)
        fill = jnp.concatenate([
            jnp.ones((3, c_pad - n_chunks), jnp.float32),
            -jnp.ones((3, c_pad - n_chunks), jnp.float32),
            jnp.zeros((2, c_pad - n_chunks), jnp.float32),
        ], axis=0)
        aabb_smem = jnp.concatenate([aabb_smem, fill], axis=1)
    sup_smem = jnp.concatenate(
        [accel.sup_min.T, accel.sup_max.T,
         jnp.zeros((2, s_n), jnp.float32)], axis=0)
    tri_rows = accel.pages.shape[1]
    kernel = functools.partial(_sweep_kernel, n_chunks=n_chunks,
                               n_supers=s_n, tri_rows=tri_rows,
                               n_closest=n_closest)
    best, prim, c_nxt, e2_nxt, c2_nxt = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)]
        + [_ray_spec()] * 11,
        out_specs=tuple(_ray_spec() for _ in range(5)),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, tri_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(aabb_smem, sup_smem, accel.pages, *tiles)
    return (best.reshape(-1)[:n], prim.reshape(-1)[:n],
            c_nxt.reshape(-1)[:n], e2_nxt.reshape(-1)[:n],
            c2_nxt.reshape(-1)[:n])


def _sweep_super_kernel(
    chk_ref,                        # (8, C_pad) SMEM chunk bounds
    pages_ref,                      # (C_pad, tri_rows, 128) ANY (HBM)
    sid_t, ox, oy, oz, dx, dy, dz, limit,   # VMEM ray tiles
    best_t_ref, best_p_ref,         # VMEM outs
    page_scr,                       # (2, SUPER_CHUNKS, tri_rows, 128) VMEM
    sem,                            # DMA sems (2,)
    n_supers: int,
    tri_rows: int,
    unroll: int,
):
    """Sweep each ray tile against the 8 contiguous chunk pages of every
    distinct super-chunk id bound to the tile.  One DMA streams the whole
    super (8 pages); per chunk a tile-level AABB test skips chunks no ray
    can improve against."""
    sids = sid_t[...]
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    ix, iy, iz = _safe_inv(rdx), _safe_inv(rdy), _safe_inv(rdz)
    lim = limit[...]
    sent = jnp.int32(n_supers)

    best_t_ref[...] = lim
    best_p_ref[...] = jnp.full((SUBLANES, LANES), -1, jnp.int32)

    def fetch(sid, slot):
        base = jnp.minimum(sid, sent - 1) * SUPER_CHUNKS
        return pltpu.make_async_copy(
            pages_ref.at[pl.ds(base, SUPER_CHUNKS)],
            page_scr.at[slot],
            sem.at[slot],
        )

    def tile_min_after(cur):
        return jnp.min(jnp.where(sids > cur, sids, sent))

    first = tile_min_after(jnp.int32(-1))

    @pl.when(first < sent)
    def _():
        fetch(first, 0).start()

    def body(carry):
        cur, slot = carry
        nxt = tile_min_after(cur)

        @pl.when(nxt < sent)
        def _():
            fetch(nxt, 1 - slot).start()

        fetch(cur, slot).wait()
        for cc in range(SUPER_CHUNKS):
            cid = cur * SUPER_CHUNKS + cc
            bt = best_t_ref[...]
            t0x = (chk_ref[0, cid] - rox) * ix
            t0y = (chk_ref[1, cid] - roy) * iy
            t0z = (chk_ref[2, cid] - roz) * iz
            t1x = (chk_ref[3, cid] - rox) * ix
            t1y = (chk_ref[4, cid] - roy) * iy
            t1z = (chk_ref[5, cid] - roz) * iz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), RAY_EPS),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            mask = (tn <= tf) & (tn < bt)

            @pl.when(jnp.any(mask))
            def _(cc=cc, mask=mask):
                bt = best_t_ref[...]
                bp = best_p_ref[...]

                def row(g, carry):
                    bt, bp = carry
                    blk = page_scr[slot, cc, pl.ds(g, 1), :]
                    for kk in range(8):
                        base = 16 * kk
                        tri12 = tuple(blk[0, base + r] for r in range(9)) \
                            + tuple(blk[0, base + 10 + r] for r in range(3))
                        prim = blk[0, base + 9].astype(jnp.int32)
                        bt, bp = _woop_update(
                            tri12, prim, rox, roy, roz, rdx, rdy, rdz,
                            mask, bt, bp)
                    return bt, bp

                bt, bp = jax.lax.fori_loop(0, tri_rows, row, (bt, bp),
                                           unroll=unroll)
                best_t_ref[...] = bt
                best_p_ref[...] = bp

        return nxt, 1 - slot

    jax.lax.while_loop(lambda s: s[0] < sent, body, (first, 0))


def _super_tables(accel: Accel):
    """Pages + chunk-bound tables padded to full supers (built once per
    query, OUTSIDE the pass loop — the pad concat on the 16 MB page table
    must not re-run per pass).  Pad chunks get zero triangle pages (det=0
    -> never hit) and far-away bounds."""
    n_chunks = accel.pages.shape[0]
    n_supers = accel.sup_min.shape[0]
    c_pad = n_supers * SUPER_CHUNKS
    pages = accel.pages
    chk = jnp.concatenate(
        [accel.aabb_min.T, accel.aabb_max.T,
         jnp.zeros((2, n_chunks), jnp.float32)], axis=0)
    if c_pad > n_chunks:
        pages = jnp.concatenate([
            pages,
            jnp.zeros((c_pad - n_chunks,) + pages.shape[1:], pages.dtype)
            .at[:, :, 9::16].set(-1.0),
        ])
        fill = jnp.concatenate([
            jnp.full((6, c_pad - n_chunks), BIG, jnp.float32),
            jnp.zeros((2, c_pad - n_chunks), jnp.float32),
        ], axis=0)
        chk = jnp.concatenate([chk, fill], axis=1)
    return pages, chk


def _sweep_super_pass(pages, chk, n_supers, sid, ray_o, ray_d, best_t,
                      interpret):
    """Sorted-wavefront sweep over super-chunk pages."""
    n = ray_o.shape[0]
    tiles = (
        _pad_reshape(jnp.where(sid >= 0, sid, n_supers), n_supers),
        _pad_reshape(ray_o[:, 0], 0.0),
        _pad_reshape(ray_o[:, 1], 0.0),
        _pad_reshape(ray_o[:, 2], 0.0),
        _pad_reshape(ray_d[:, 0], 0.0),
        _pad_reshape(ray_d[:, 1], 0.0),
        _pad_reshape(ray_d[:, 2], 1.0),
        _pad_reshape(jnp.minimum(best_t, BIG), -BIG),
    )
    rows = tiles[0].shape[0]
    grid = (rows // SUBLANES,)
    tri_rows = pages.shape[1]
    kernel = functools.partial(_sweep_super_kernel, n_supers=n_supers,
                               tri_rows=tri_rows,
                               unroll=1 if interpret else tri_rows)
    best, prim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)]
        + [_ray_spec()] * 8,
        out_specs=(_ray_spec(), _ray_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, SUPER_CHUNKS, tri_rows, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(chk, pages, *tiles)
    return best.reshape(-1)[:n], prim.reshape(-1)[:n]


def _select_super_kernel(
    sup_ref,                      # (8, S) SMEM super bounds (6 rows + pad)
    ox, oy, oz, dx, dy, dz, bt_in, ge_in, gc_in,   # VMEM tiles
    e_out, c_out,
    n_supers: int,
):
    """Per-ray front-to-back SUPER pick: the nearest super (by AABB entry)
    strictly after the ray's (entry, super-id) lex gate whose entry beats
    its best-t.  S slab tests per ray instead of C = 8S."""
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    ix, iy, iz = _safe_inv(rdx), _safe_inv(rdy), _safe_inv(rdz)
    bt = bt_in[...]
    ge = ge_in[...]
    gc = gc_in[...]

    def body(si, carry):
        be, bc = carry
        t0x = (sup_ref[0, si] - rox) * ix
        t0y = (sup_ref[1, si] - roy) * iy
        t0z = (sup_ref[2, si] - roz) * iz
        t1x = (sup_ref[3, si] - rox) * ix
        t1y = (sup_ref[4, si] - roy) * iy
        t1z = (sup_ref[5, si] - roz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), RAY_EPS),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        sif = jnp.float32(si)
        after = (tn > ge) | ((tn == ge) & (sif > gc))
        valid = (tn <= tf) & (tn < bt) & after
        e = jnp.where(valid, tn, jnp.inf)
        c = jnp.where(valid, sif, 1.0e30)
        less = (e < be) | ((e == be) & (c < bc))
        return jnp.where(less, e, be), jnp.where(less, c, bc)

    shape = (SUBLANES, LANES)
    be, bc = jax.lax.fori_loop(
        0, n_supers, body,
        (jnp.full(shape, jnp.inf, jnp.float32),
         jnp.full(shape, 1.0e30, jnp.float32)))
    found = jnp.isfinite(be)
    e_out[...] = jnp.where(found, be, -jnp.inf)
    c_out[...] = jnp.where(found & (bc < jnp.float32(n_supers)),
                           bc.astype(jnp.int32), -1)


def _select_super_pallas(accel: Accel, ray_o, ray_d, best_t, gate_e, gate_c,
                         interpret=False):
    n = ray_o.shape[0]
    s_n = accel.sup_min.shape[0]
    sup = jnp.concatenate([
        accel.sup_min.T, accel.sup_max.T,
        jnp.zeros((2, s_n), jnp.float32),
    ], axis=0)
    tiles = (
        _pad_reshape(ray_o[:, 0], 0.0),
        _pad_reshape(ray_o[:, 1], 0.0),
        _pad_reshape(ray_o[:, 2], 0.0),
        _pad_reshape(ray_d[:, 0], 0.0),
        _pad_reshape(ray_d[:, 1], 0.0),
        _pad_reshape(ray_d[:, 2], 1.0),
        _pad_reshape(best_t, -BIG),
        _pad_reshape(gate_e, jnp.inf),
        _pad_reshape(gate_c.astype(jnp.float32), 0.0),
    )
    rows = tiles[0].shape[0]
    grid = (rows // SUBLANES,)
    kernel = functools.partial(_select_super_kernel, n_supers=s_n)
    e, c = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [_ray_spec()] * 9,
        out_specs=(_ray_spec(), _ray_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )(sup, *tiles)
    return e.reshape(-1)[:n], c.reshape(-1)[:n]


def _select_super_dense(accel: Accel, ray_o, ray_d, best_t, gate_e, gate_c,
                        alive):
    """XLA fallback (interpret/CPU): dense slab scan over super bounds."""
    s_n = accel.sup_min.shape[0]
    inv = _safe_inv(ray_d)
    o = ray_o[:, None, :]
    t0 = (accel.sup_min[None] - o) * inv[:, None, :]
    t1 = (accel.sup_max[None] - o) * inv[:, None, :]
    tn = jnp.maximum(jnp.max(jnp.minimum(t0, t1), axis=-1), RAY_EPS)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    sids = jnp.arange(s_n, dtype=jnp.int32)[None, :]
    after = (tn > gate_e[:, None]) | (
        (tn == gate_e[:, None]) & (sids > gate_c[:, None]))
    valid = ((tn <= tf) & (tn < best_t[:, None]) & after & alive[:, None])
    e = jnp.where(valid, tn, jnp.inf)
    ej = jnp.min(e, axis=-1)
    cj = jnp.min(jnp.where(e == ej[:, None], sids, jnp.int32(1 << 30)),
                 axis=-1)
    none = ~jnp.isfinite(ej)
    return (jnp.where(none, -jnp.inf, ej),
            jnp.where(none, -1, cj))


def _query_super(accel: Accel, ray_o, ray_d, maxt, active, occlusion: bool,
                 interpret: bool):
    """Pass loop in super mode: select nearest SUPER front-to-back, sort by
    super id, sweep its 8 chunk pages.  Same cascade as _query."""
    n = ray_o.shape[0]
    idx0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    n_supers = accel.sup_min.shape[0]
    sent = jnp.int32(n_supers)
    pages_pad, chk_pad = _super_tables(accel)

    state = (
        ray_o[:, 0], ray_o[:, 1], ray_o[:, 2],
        ray_d[:, 0], ray_d[:, 1], ray_d[:, 2],
        jnp.where(active, jnp.minimum(maxt, BIG), -BIG),
        jnp.full(n, -1, jnp.int32),
        jnp.full(n, -jnp.inf, jnp.float32),
        jnp.full(n, -1, jnp.int32),
        idx0,
    )

    def pick(st):
        ox, oy, oz, dx, dy, dz, bt, bp, ge, gc, oidx = st
        o = jnp.stack([ox, oy, oz], -1)
        d = jnp.stack([dx, dy, dz], -1)
        if interpret:
            e1, s1 = _select_super_dense(accel, o, d, bt, ge, gc, bt > 0)
        else:
            e1, s1 = _select_super_pallas(accel, o, d, bt, ge, gc)
        valid = s1 >= 0
        ge = jnp.where(valid, e1, ge)
        gc = jnp.where(valid, s1, gc)
        st = (ox, oy, oz, dx, dy, dz, bt, bp, ge, gc, oidx)
        return st, (s1,)

    def body(carry):
        st, sids = carry
        key = jnp.where(sids[0] >= 0, sids[0], sent)
        sorted_ = jax.lax.sort((key,) + st, num_keys=1)
        key = sorted_[0]
        sid = jnp.where(key < sent, key, -1)
        st = sorted_[1:]
        ox, oy, oz, dx, dy, dz, bt, bp, ge, gc, oidx = st
        o = jnp.stack([ox, oy, oz], -1)
        d = jnp.stack([dx, dy, dz], -1)
        t_new, p_new = _sweep_super_pass(pages_pad, chk_pad, n_supers, sid,
                                         o, d, bt, interpret)
        improved = p_new >= 0
        bt = jnp.where(improved, t_new, bt)
        bp = jnp.where(improved, p_new, bp)
        if occlusion:
            bt = jnp.where(bp >= 0, -BIG, bt)
        st = (ox, oy, oz, dx, dy, dz, bt, bp, ge, gc, oidx)
        return pick(st)

    if interpret:
        carry = pick(state)
        steps = int(accel.sup_min.shape[0]) + 1
        for _ in range(steps):
            carry = body(carry)
        st, _sids = carry
    else:
        st, sids = pick(state)
        size = n
        sizes = []
        floor = LADDER_FLOOR_TILES * TILE
        while size > floor:
            sizes.append(size)
            size = max(size * LADDER_NUM // LADDER_DEN, floor)
            size -= size % TILE
        sizes.append(size)
        for i, sz in enumerate(sizes):
            last = i == len(sizes) - 1
            head = tuple(a[:sz] for a in st)
            sids_h = tuple(c[:sz] for c in sids)

            if last:
                def cond(c, sz=sz):
                    return jnp.any(c[1][0] >= 0)
            else:
                def cond(c, sz=sz, nxt=sizes[i + 1]):
                    return jnp.sum((c[1][0] >= 0).astype(jnp.int32)) > nxt

            head, sids_h = jax.lax.while_loop(cond, body, (head, sids_h))
            if not last:
                key = jnp.where(sids_h[0] >= 0, sids_h[0], sent)
                sorted_ = jax.lax.sort((key,) + head, num_keys=1)
                key = sorted_[0]
                sids_h = (jnp.where(key < sent, key, -1),)
                head = sorted_[1:]
            st = tuple(
                jax.lax.dynamic_update_slice(a, h, (0,))
                for a, h in zip(st, head)
            )
            sids = tuple(
                jax.lax.dynamic_update_slice(a, h, (0,))
                for a, h in zip(sids, sids_h)
            )

    (_, _, _, _, _, _, bt, bp, _, _, oidx) = st
    res = jax.lax.sort((oidx, bt, bp), num_keys=1)
    bt, bp = res[1], res[2]
    t = jnp.where(bp < 0, jnp.inf, bt)
    return t, bp


def _select_kernel(
    sup_ref,                      # (8, S) SMEM super bounds (6 rows + pad)
    chk_ref,                      # (8, C_pad) SMEM chunk bounds
    ox, oy, oz, dx, dy, dz, bt_in, ge_in, gc_in,   # VMEM tiles
    *out_refs,                    # 2*SELECT_K VMEM out (e_k, c_k pairs)
    n_supers: int, n_chunks: int,
):
    """Per-ray front-to-back chunk pick (exact), with super-chunk packet
    pruning: a super is skipped only when NO ray in the tile can beat its
    own best-t inside it — a gate-independent, always-safe cull.

    Emits the SELECT_K lexicographically-first (entry, chunk) candidates
    after each ray's gate, maintained as K sorted register pairs with a
    bubble-insert per tested chunk — so one select (the dense-scan cost)
    feeds K chunk visits in the following sweep pass."""
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    ix, iy, iz = _safe_inv(rdx), _safe_inv(rdy), _safe_inv(rdz)
    bt = bt_in[...]
    ge = ge_in[...]
    gc = gc_in[...]

    def slab(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz):
        t0x = (bminx - rox) * ix
        t1x = (bmaxx - rox) * ix
        t0y = (bminy - roy) * iy
        t1y = (bmaxy - roy) * iy
        t0z = (bminz - roz) * iz
        t1z = (bmaxz - roz) * iz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.maximum(jnp.minimum(t0z, t1z), RAY_EPS),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        return tn, tf

    kk = SELECT_K

    def sup_body(si, carry):
        bes, bcs = carry
        tn, tf = slab(sup_ref[0, si], sup_ref[1, si], sup_ref[2, si],
                      sup_ref[3, si], sup_ref[4, si], sup_ref[5, si])
        # prune against each ray's WORST kept candidate (bes[-1]): a super
        # can only matter if some ray could still insert a chunk from it
        hit = jnp.any((tn <= tf) & (tn < jnp.minimum(bt, bes[kk - 1])))

        def scan8(carry):
            bes, bcs = carry
            bes = list(bes)
            bcs = list(bcs)
            for k in range(SUPER_CHUNKS):
                ci = si * SUPER_CHUNKS + k
                tn, tf = slab(chk_ref[0, ci], chk_ref[1, ci],
                              chk_ref[2, ci], chk_ref[3, ci],
                              chk_ref[4, ci], chk_ref[5, ci])
                cif = ci.astype(jnp.float32)
                after = (tn > ge) | ((tn == ge) & (cif > gc))
                # mask pad chunks (ci >= n_chunks) at the source: their
                # fill bounds (min=+1, max=-1) reorder into a hittable
                # [-1,1]^3 box under the slab min/max and would otherwise
                # burn SELECT_K slots with phantom candidates
                valid = (tn <= tf) & (tn < bt) & after \
                    & (cif < jnp.float32(n_chunks))
                e = jnp.where(valid, tn, jnp.inf)
                c = jnp.where(valid, cif, 1.0e30)
                # bubble-insert (e, c) into the K sorted register pairs;
                # the evicted lex-max rides on in (e, c)
                for j in range(kk):
                    less = (e < bes[j]) | ((e == bes[j]) & (c < bcs[j]))
                    ne = jnp.where(less, e, bes[j])
                    nc = jnp.where(less, c, bcs[j])
                    e = jnp.where(less, bes[j], e)
                    c = jnp.where(less, bcs[j], c)
                    bes[j] = ne
                    bcs[j] = nc
            return tuple(bes), tuple(bcs)

        return jax.lax.cond(hit, scan8, lambda c: c, (bes, bcs))

    shape = (SUBLANES, LANES)
    init = (tuple(jnp.full(shape, jnp.inf, jnp.float32)
                  for _ in range(kk)),
            tuple(jnp.full(shape, 1.0e30, jnp.float32)
                  for _ in range(kk)))
    bes, bcs = jax.lax.fori_loop(0, n_supers, sup_body, init)
    for j in range(kk):
        found = jnp.isfinite(bes[j])
        out_refs[2 * j][...] = jnp.where(found, bes[j], -jnp.inf)
        out_refs[2 * j + 1][...] = jnp.where(
            found & (bcs[j] < jnp.float32(n_chunks)),
            bcs[j].astype(jnp.int32), -1)


def _select_next_pallas(accel: Accel, ray_o, ray_d, best_t, gate_e, gate_c,
                        interpret=False):
    n = ray_o.shape[0]
    c = accel.aabb_min.shape[0]
    s_n = accel.sup_min.shape[0]
    c_pad = s_n * SUPER_CHUNKS
    chk = jnp.concatenate([
        accel.aabb_min.T,
        accel.aabb_max.T,
        jnp.zeros((2, c), jnp.float32),
    ], axis=0)
    if c_pad > c:
        fill = jnp.concatenate([
            jnp.ones((3, c_pad - c), jnp.float32),
            -jnp.ones((3, c_pad - c), jnp.float32),
            jnp.zeros((2, c_pad - c), jnp.float32),
        ], axis=0)
        chk = jnp.concatenate([chk, fill], axis=1)
    sup = jnp.concatenate([
        accel.sup_min.T, accel.sup_max.T,
        jnp.zeros((2, s_n), jnp.float32),
    ], axis=0)
    tiles = (
        _pad_reshape(ray_o[:, 0], 0.0),
        _pad_reshape(ray_o[:, 1], 0.0),
        _pad_reshape(ray_o[:, 2], 0.0),
        _pad_reshape(ray_d[:, 0], 0.0),
        _pad_reshape(ray_d[:, 1], 0.0),
        _pad_reshape(ray_d[:, 2], 1.0),
        _pad_reshape(best_t, -BIG),
        _pad_reshape(gate_e, jnp.inf),
        _pad_reshape(gate_c.astype(jnp.float32), 0.0),
    )
    rows = tiles[0].shape[0]
    grid = (rows // SUBLANES,)
    kernel = functools.partial(_select_kernel, n_supers=s_n, n_chunks=c)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [_ray_spec()] * 9,
        out_specs=tuple(_ray_spec() for _ in range(2 * SELECT_K)),
        out_shape=tuple(
            jax.ShapeDtypeStruct(
                (rows, LANES), jnp.float32 if i % 2 == 0 else jnp.int32)
            for i in range(2 * SELECT_K)
        ),
        interpret=interpret,
    )(sup, chk, *tiles)
    es = tuple(out[2 * j].reshape(-1)[:n] for j in range(SELECT_K))
    cids = tuple(out[2 * j + 1].reshape(-1)[:n] for j in range(SELECT_K))
    return es, cids


_SEL_BLOCK = 8


def _select_next(accel: Accel, ray_o, ray_d, inv_d, best_t, gate_e, gate_c,
                 alive):
    """Per ray: (entry, chunk) of the nearest chunk strictly after the
    (gate_e, gate_c) lex gate whose AABB entry beats best_t; (-inf, -1) if
    none.  Dense slab tests over chunk blocks under lax.scan — regular VPU
    work, no gathers."""
    c = accel.aabb_min.shape[0]
    pad = (-c) % _SEL_BLOCK
    amin = jnp.concatenate(
        [accel.aabb_min, jnp.full((pad, 3), 1.0, jnp.float32)])
    amax = jnp.concatenate(
        [accel.aabb_max, jnp.full((pad, 3), -1.0, jnp.float32)])
    nb = amin.shape[0] // _SEL_BLOCK
    amin_b = amin.reshape(nb, _SEL_BLOCK, 3)
    amax_b = amax.reshape(nb, _SEL_BLOCK, 3)
    bases = (jnp.arange(nb) * _SEL_BLOCK).astype(jnp.int32)

    o = ray_o[:, None, :]
    inv = inv_d[:, None, :]

    def body(carry, blk):
        be, bc = carry
        bmin, bmax, base = blk
        t0 = (bmin[None] - o) * inv
        t1 = (bmax[None] - o) * inv
        tn = jnp.maximum(
            jnp.max(jnp.minimum(t0, t1), axis=-1), RAY_EPS)
        tf = jnp.minimum(
            jnp.min(jnp.maximum(t0, t1), axis=-1), best_t[:, None])
        cids = base + jnp.arange(_SEL_BLOCK, dtype=jnp.int32)[None, :]
        after_gate = (tn > gate_e[:, None]) | (
            (tn == gate_e[:, None]) & (cids > gate_c[:, None]))
        # mask pad chunks (cid >= c): their fill bounds alias a hittable
        # [-1,1]^3 box under the slab min/max reordering
        valid = (tn <= tf) & after_gate & alive[:, None] & (cids < c)
        e = jnp.where(valid, tn, jnp.inf)
        ej = jnp.min(e, axis=-1)
        # ties -> smallest chunk id (pure reductions; no gathers)
        cj = jnp.min(jnp.where(e == ej[:, None], cids, jnp.int32(1 << 30)),
                     axis=-1)
        better = ej < be  # ties keep the earlier (smaller-cid) block
        return (jnp.where(better, ej, be),
                jnp.where(better, cj, bc)), None

    init = (jnp.full(ray_o.shape[0], jnp.inf, jnp.float32),
            jnp.full(ray_o.shape[0], -1, jnp.int32))
    (e, cid), _ = jax.lax.scan(body, init, (amin_b, amax_b, bases))
    none = ~jnp.isfinite(e)
    return jnp.where(none, -jnp.inf, e), jnp.where(none, -1, cid)


def _query(accel: Accel, ray_o, ray_d, maxt, active, n_closest: int,
           interpret: bool):
    """Pass loop in chunk mode.  Rays with original index >= ``n_closest``
    are occlusion (any-hit) rays — merged wavefronts lay closest-hit rays
    first so the mode needs no per-lane array through the per-pass sorts."""
    n = ray_o.shape[0]
    idx0 = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    sent = jnp.int32(accel.pages.shape[0])

    state = (
        ray_o[:, 0], ray_o[:, 1], ray_o[:, 2],
        ray_d[:, 0], ray_d[:, 1], ray_d[:, 2],
        jnp.where(active, jnp.minimum(maxt, BIG), -BIG),  # best_t
        jnp.full(n, -1, jnp.int32),                       # best_p
        jnp.full(n, -jnp.inf, jnp.float32),               # cache_e
        jnp.full(n, -2.0, jnp.float32),                   # cache_c: encoded
        idx0,                                             #   fresh gate -1
    )
    cids = (jnp.full(n, -1, jnp.int32),)  # nothing bound before pass 1

    def live_of(st, cids):
        """Rays the pass loop still owes work: a bound candidate, or a dry
        cache (encoded gate <= -2) awaiting an in-kernel refill."""
        bt, c2 = st[6], st[9]
        return (cids[0] >= 0) | ((c2 <= -2.0) & (bt > -BIG))

    def sort_state(st, cids):
        """Bin by bound chunk; refill-pending rays (key = sent) stay ahead
        of finished ones (sent + 1) so cascade slices keep every live ray
        in the prefix."""
        live = live_of(st, cids)
        key = jnp.where(cids[0] >= 0, cids[0],
                        jnp.where(live, sent, sent + 1))
        sorted_ = jax.lax.sort((key,) + st, num_keys=1)
        key = sorted_[0]
        return sorted_[1:], (jnp.where(key < sent, key, -1),)

    def body(carry):
        """One pass over an ALREADY-SORTED prefix; re-sorts at the end so
        the sort doubles as the cascade handoff compaction (no separate
        per-stage sorts)."""
        st, cids = carry
        ox, oy, oz, dx, dy, dz, bt, bp, e2, c2, oidx = st
        o = jnp.stack([ox, oy, oz], -1)
        d = jnp.stack([dx, dy, dz], -1)
        t_new, p_new, c1, e2, c2 = _sweep_pass(
            accel, cids[0], o, d, bt, e2, c2, oidx, n_closest, interpret)
        improved = p_new >= 0
        bt = jnp.where(improved, t_new, bt)
        bp = jnp.where(improved, p_new, bp)
        st = (ox, oy, oz, dx, dy, dz, bt, bp, e2, c2, oidx)
        return sort_state(st, (c1,))

    st, cids = sort_state(state, cids)
    if interpret:
        # interpreter path (CPU tests): bounded unrolled loop (small C);
        # +2 covers the initial refill-only pass
        carry = (st, cids)
        steps = int(accel.pages.shape[0]) + 2
        for _ in range(steps):
            carry = body(carry)
        st, cids = carry
    else:
        # Cascade: the live count shrinks geometrically with passes, so
        # late passes run on statically-sliced prefixes.  The trailing
        # sort of each pass maintains the "live rays in the prefix"
        # invariant, so stage handoffs slice directly (no per-stage
        # compaction sorts), and stages wider than the initial live count
        # fall through before doing ANY work — low-occupancy wavefronts
        # (bounce loops average ~50-60% dead lanes) compact away before
        # the first selection scan runs.  Ladder ratio 2 hands off at the
        # median of the per-ray visit distribution (round-4 measurement).
        size = n
        sizes = []
        floor = LADDER_FLOOR_TILES * TILE
        while size > floor:
            sizes.append(size)
            size = max(size * LADDER_NUM // LADDER_DEN, floor)
            size -= size % TILE
        sizes.append(size)
        for i, sz in enumerate(sizes):
            last = i == len(sizes) - 1
            head = tuple(a[:sz] for a in st)
            cids_h = tuple(c[:sz] for c in cids)

            if last:
                def cond(c, sz=sz):
                    return jnp.any(live_of(c[0], c[1]))
            else:
                def cond(c, sz=sz, nxt=sizes[i + 1]):
                    return jnp.sum(
                        live_of(c[0], c[1]).astype(jnp.int32)) > nxt

            head, cids_h = jax.lax.while_loop(
                cond, body, (head, cids_h))
            st = tuple(
                jax.lax.dynamic_update_slice(a, h, (0,))
                for a, h in zip(st, head)
            )
            cids = tuple(
                jax.lax.dynamic_update_slice(a, h, (0,))
                for a, h in zip(cids, cids_h)
            )

    (_, _, _, _, _, _, bt, bp, _, _, oidx) = st
    res = jax.lax.sort((oidx, bt, bp), num_keys=1)
    bt, bp = res[1], res[2]
    t = jnp.where(bp < 0, jnp.inf, bt)
    return t, bp


@functools.partial(jax.jit, static_argnames=("interpret",))
def closest_hit_bvh(accel: Accel, ray_o, ray_d, maxt, active,
                    interpret: bool = False):
    """Closest-hit query through the chunked structure.

    Returns (t (N,) f32 — +inf on miss, prim (N,) i32 — -1 on miss), with
    ``prim`` in the scene's original triangle numbering."""
    if BVH_MODE == "super":
        return _query_super(accel, ray_o, ray_d, maxt, active,
                            occlusion=False, interpret=interpret)
    return _query(accel, ray_o, ray_d, maxt, active,
                  n_closest=ray_o.shape[0], interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ray_test_bvh(accel: Accel, ray_o, ray_d, maxt, active,
                 interpret: bool = False):
    """Any-hit (occlusion) query through the chunked structure.

    Same pass loop as closest-hit but a ray stops at its FIRST hit (its
    best_t collapses so no remaining chunk passes the entry test)."""
    if BVH_MODE == "super":
        _, prim = _query_super(accel, ray_o, ray_d, maxt, active,
                               occlusion=True, interpret=interpret)
        return prim >= 0
    _, prim = _query(accel, ray_o, ray_d, maxt, active, n_closest=0,
                     interpret=interpret)
    return prim >= 0


@functools.partial(jax.jit, static_argnames=("n_closest", "interpret"))
def mixed_query_bvh(accel: Accel, ray_o, ray_d, maxt, active,
                    n_closest: int, interpret: bool = False):
    """One pass loop over a MERGED wavefront: lanes [0, n_closest) are
    closest-hit rays, lanes [n_closest, N) are any-hit occlusion rays.

    Merging a bounce's next-ray queries with the previous bounce's shadow
    rays doubles the sorted wavefront the pass loop amortizes its dense
    selection scans, sorts and cascade over, and packs the per-tile chunk
    bins denser (integrators/path*.py pipelining).  Returns (t, prim);
    occlusion lanes report hits as prim >= 0 (their t is collapsed)."""
    return _query(accel, ray_o, ray_d, maxt, active,
                  n_closest=n_closest, interpret=interpret)
