"""Pallas TPU kernels for ray / triangle-soup intersection.

This is the hot kernel of the renderer (SURVEY.md section 7 ranks it #1).
The jnp reference implementation (ops/intersect.py) is memory-bound on TPU:
its broadcasted (N, TRI_CHUNK) Moller-Trumbore temporaries spill to HBM
(~10 GB of traffic per 2M-ray sweep).  Here each program keeps a
(SUBLANES x LANES) tile of rays resident in VMEM and sweeps the triangle
list *one triangle per iteration as scalar broadcasts* — every VPU op runs
on a full (128, 512) f32 tile, the running (best_t, best_index) update is a
pair of selects (no argmin, no gathers), and nothing round-trips to HBM.

Barycentrics of the winning triangle are recomputed once outside the kernel
from the (tiny) triangle table.

Complexity is O(N * M): ideal for the reference's canonical scenes (tens of
triangles, millions of rays — SURVEY.md section 6).  For large meshes a
two-level culling/BVH scheme goes on top; this kernel stays the leaf sweep.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 512  # last dim (multiple of 128)
SUBLANES = 128  # second-to-last dim (multiple of 8)
TILE = LANES * SUBLANES  # rays per program
RAY_EPS = 1e-4
BIG = 3.0e38
MAX_SMEM_TRIS = 4096


def _pad_reshape(x, fill):
    n = x.shape[0]
    pad = (-n) % TILE
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x.reshape(-1, LANES)


def _closest_hit_kernel(
    tri_ref,  # (10, M_pad) f32: v0xyz, e1xyz, e2xyz rows + pad row
    ox, oy, oz, dx, dy, dz, limit,  # (SUBLANES, LANES) ray tiles
    best_t_ref, best_i_ref,
    *, n_tris: int,
):
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]

    def body(t, carry):
        best_t, best_i = carry
        cv0x = tri_ref[0, t]
        cv0y = tri_ref[1, t]
        cv0z = tri_ref[2, t]
        ce1x = tri_ref[3, t]
        ce1y = tri_ref[4, t]
        ce1z = tri_ref[5, t]
        ce2x = tri_ref[6, t]
        ce2y = tri_ref[7, t]
        ce2z = tri_ref[8, t]

        px = rdy * ce2z - rdz * ce2y
        py = rdz * ce2x - rdx * ce2z
        pz = rdx * ce2y - rdy * ce2x
        det = ce1x * px + ce1y * py + ce1z * pz
        det_ok = jnp.abs(det) > 1e-12
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        tvx = rox - cv0x
        tvy = roy - cv0y
        tvz = roz - cv0z
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * ce1z - tvz * ce1y
        qy = tvz * ce1x - tvx * ce1z
        qz = tvx * ce1y - tvy * ce1x
        v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        tt = (ce2x * qx + ce2y * qy + ce2z * qz) * inv_det
        hit = (
            det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (tt > RAY_EPS) & (tt < best_t)
        )
        best_i = jnp.where(hit, t, best_i)
        best_t = jnp.where(hit, tt, best_t)
        return best_t, best_i

    init = (limit[...], jnp.full((SUBLANES, LANES), -1, jnp.int32))
    # fully unroll small soups so Mosaic can overlap the SMEM scalar reads
    # of one triangle with the vector math of the previous one (pallas only
    # supports full unroll)
    best_t, best_i = jax.lax.fori_loop(
        0, n_tris, body, init, unroll=n_tris if n_tris <= 128 else 1)
    best_t_ref[...] = best_t
    best_i_ref[...] = best_i


def _any_hit_kernel(
    tri_ref, ox, oy, oz, dx, dy, dz, limit,
    occ_ref,
    *, n_tris: int,
):
    rox, roy, roz = ox[...], oy[...], oz[...]
    rdx, rdy, rdz = dx[...], dy[...], dz[...]
    lim = limit[...]

    def body(t, occ):
        cv0x = tri_ref[0, t]
        cv0y = tri_ref[1, t]
        cv0z = tri_ref[2, t]
        ce1x = tri_ref[3, t]
        ce1y = tri_ref[4, t]
        ce1z = tri_ref[5, t]
        ce2x = tri_ref[6, t]
        ce2y = tri_ref[7, t]
        ce2z = tri_ref[8, t]
        px = rdy * ce2z - rdz * ce2y
        py = rdz * ce2x - rdx * ce2z
        pz = rdx * ce2y - rdy * ce2x
        det = ce1x * px + ce1y * py + ce1z * pz
        det_ok = jnp.abs(det) > 1e-12
        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
        tvx = rox - cv0x
        tvy = roy - cv0y
        tvz = roz - cv0z
        u = (tvx * px + tvy * py + tvz * pz) * inv_det
        qx = tvy * ce1z - tvz * ce1y
        qy = tvz * ce1x - tvx * ce1z
        qz = tvx * ce1y - tvy * ce1x
        v = (rdx * qx + rdy * qy + rdz * qz) * inv_det
        tt = (ce2x * qx + ce2y * qy + ce2z * qz) * inv_det
        hit = (
            det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (tt > RAY_EPS) & (tt < lim)
        )
        # f32 accumulator: Mosaic cannot carry i1 mask vectors in scf.for
        return jnp.maximum(occ, hit.astype(jnp.float32))

    occ = jax.lax.fori_loop(
        0, n_tris, body, jnp.zeros((SUBLANES, LANES), jnp.float32),
        unroll=n_tris if n_tris <= 128 else 1,
    )
    occ_ref[...] = occ


def _tri_table(v0, e1, e2):
    """Pack triangle components as a (9, M) f32 table placed in SMEM (scalar
    memory supports the dynamic per-triangle scalar reads the sweep needs).
    SMEM is small, so the soup is capped; larger scenes take the jnp path
    until the two-level (BVH) scheme lands."""
    m = v0.shape[0]
    if m > MAX_SMEM_TRIS:
        raise ValueError(
            f"pallas sweep caps at {MAX_SMEM_TRIS} triangles (got {m})"
        )
    rows = []
    for arr in (v0, e1, e2):
        for k in range(3):
            rows.append(arr[:, k])
    return jnp.stack(rows), m


def _ray_tiles(ray_o, ray_d, maxt, active):
    ox = _pad_reshape(ray_o[:, 0], 0.0)
    oy = _pad_reshape(ray_o[:, 1], 0.0)
    oz = _pad_reshape(ray_o[:, 2], 0.0)
    dx = _pad_reshape(ray_d[:, 0], 0.0)
    dy = _pad_reshape(ray_d[:, 1], 0.0)
    dz = _pad_reshape(ray_d[:, 2], 1.0)
    limit = _pad_reshape(
        jnp.where(active, jnp.minimum(maxt, BIG), -BIG), -BIG
    )
    return ox, oy, oz, dx, dy, dz, limit


def _ray_spec():
    return pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


@jax.jit
def closest_hit_pallas(v0, e1, e2, ray_o, ray_d, maxt, active):
    """Closest-hit (t, prim) only — no barycentric post-processing."""
    n = ray_o.shape[0]
    table, n_tris = _tri_table(v0, e1, e2)
    tiles = _ray_tiles(ray_o, ray_d, maxt, active)
    rows = tiles[0].shape[0]
    grid = (rows // SUBLANES,)
    kernel = functools.partial(_closest_hit_kernel, n_tris=n_tris)
    best_t, best_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [_ray_spec()] * 7,
        out_specs=(_ray_spec(), _ray_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
    )(table, *tiles)
    best_t = best_t.reshape(-1)[:n]
    prim = best_i.reshape(-1)[:n]
    t = jnp.where(prim < 0, jnp.inf, best_t)
    return t, prim


@jax.jit
def intersect_soup_pallas(v0, e1, e2, ray_o, ray_d, maxt, active):
    """Closest-hit query; same contract as ops.intersect.intersect_soup."""
    n = ray_o.shape[0]
    table, n_tris = _tri_table(v0, e1, e2)
    tiles = _ray_tiles(ray_o, ray_d, maxt, active)
    rows = tiles[0].shape[0]
    grid = (rows // SUBLANES,)

    kernel = functools.partial(_closest_hit_kernel, n_tris=n_tris)
    best_t, best_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [_ray_spec()] * 7,
        out_specs=(_ray_spec(), _ray_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
    )(table, *tiles)
    best_t = best_t.reshape(-1)[:n]
    prim = best_i.reshape(-1)[:n]
    miss = prim < 0
    t = jnp.where(miss, jnp.inf, best_t)

    # Recompute barycentrics for the winning triangle (tiny table gather).
    pc = jnp.maximum(prim, 0)
    tv0 = v0[pc]
    te1 = e1[pc]
    te2 = e2[pc]
    pvec = jnp.cross(ray_d, te2)
    det = jnp.sum(te1 * pvec, axis=-1)
    inv = jnp.where(jnp.abs(det) > 1e-12,
                    1.0 / jnp.where(det != 0, det, 1.0), 0.0)
    tvec = ray_o - tv0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, te1)
    v = jnp.sum(ray_d * qvec, axis=-1) * inv
    u = jnp.where(miss, 0.0, u)
    v = jnp.where(miss, 0.0, v)
    return t, prim, u, v


@jax.jit
def ray_test_soup_pallas(v0, e1, e2, ray_o, ray_d, maxt, active):
    """Any-hit query; same contract as ops.intersect.ray_test_soup."""
    n = ray_o.shape[0]
    table, n_tris = _tri_table(v0, e1, e2)
    tiles = _ray_tiles(ray_o, ray_d, maxt, active)
    rows = tiles[0].shape[0]
    grid = (rows // SUBLANES,)

    kernel = functools.partial(_any_hit_kernel, n_tris=n_tris)
    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [_ray_spec()] * 7,
        out_specs=_ray_spec(),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
    )(table, *tiles)
    return (occ.reshape(-1)[:n] > 0.0) & active
