"""Large-scene ray-tracing acceleration structure (host-side build).

TPU-native replacement for Embree/OptiX BVHs (the native layer behind
``mi.Scene.ray_intersect`` — SURVEY.md §2.2 row 1) for scenes too large for
the single-level SMEM triangle sweep (ops/intersect_pallas.py caps at 4096
triangles; the reference's staircase scene has ~263k).

Design — *binned rays + dense chunk sweeps*, chosen for the TPU execution
model rather than translated from the reference's CUDA/Embree patterns.
Classic per-ray BVH descent needs per-lane gathers and divergent stacks
(TPU-hostile), and tile-packet traversal (AND over a ray tile) collapses on
incoherent bounce wavefronts (measured 0.2-0.4 Mrays/s).  Instead:

- Triangles are globally reordered by a median-split BVH (native C++
  builder, native/mitr_native.cpp), then cut into SUBTREE-ALIGNED *chunks*
  of <= 2*CHUNK_TRIS triangles (_subtree_ranges) — subtree bounds are far
  tighter than equal-size cuts of the same order (staircase: per-ray
  candidates 8.33 -> 6.30 mean, 27 -> 17 p99).  Each chunk is a padded
  page of Woop triangle records plus one AABB.
- A query runs a few *passes* (lax.while_loop).  Per pass every ray picks
  its next chunk front-to-back: a dense, fully-vectorized slab test against
  all C chunk AABBs with an (entry-t, chunk-id) lexicographic gate — pure
  VPU work, no divergence.  Rays are then sorted by chunk id (one
  ``lax.sort``, ~3 ms for 2M rays on v5e) and a Pallas kernel sweeps each
  ray tile against its bound chunk page: the page is selected per tile via
  scalar prefetch, so XLA streams pages HBM->SMEM double-buffered, and
  consecutive tiles bound to the same chunk reuse the resident page.
- A ray is finished when its best hit is closer than every remaining
  chunk's entry distance (front-to-back order makes this typically 1-3
  passes); finished rays sort into a sentinel bin whose tiles the kernel
  skips in O(1).

All integers ride in f32 lanes (< 2^24, exact).  See ops/bvh_pallas.py for
the kernels and the pass loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import native

CHUNK_TRIS = 256   # target triangles per chunk; subtree-aligned cuts are
# <= 2*CHUNK_TRIS and pages pad to a per-accel common cap (build_accel).
# Swept under the SAH builder on the 262k-tri staircase (round 5,
# scripts/r5_chunk_sweep.py, 1M-ray synthetic): 128 -> 5.04 Mrays/s inc,
# 256 -> 5.79 (coh 14.68), 512 -> 5.40, 1024 -> 4.33.
# Threshold above which scenes get an accel structure (matches the
# single-level Pallas sweep's SMEM cap, intersect_pallas.MAX_SMEM_TRIS).
ACCEL_MIN_TRIS = 4096


SUPER_CHUNKS = 8   # chunks per super-chunk (selection-kernel pruning level)


class Accel(NamedTuple):
    """Device-side pytree. Shapes are static per scene."""

    aabb_min: jnp.ndarray  # (C, 3) f32 chunk bounds
    aabb_max: jnp.ndarray  # (C, 3) f32
    sup_min: jnp.ndarray   # (ceil(C/8), 3) f32 super-chunk bounds
    sup_max: jnp.ndarray   # (ceil(C/8), 3) f32
    pages: jnp.ndarray     # (C, cap // 8, 128) f32 chunk pages:
    #   each 128-lane row holds 8 triangles x 16 fields in the Woop
    #   unit-triangle-transform representation: rows a0 a1 a2 of
    #   A = [e1 e2 n]^-1 (fields 0:9), original prim id (-1 pad, field 9),
    #   c = A @ v0 (fields 10:13), 3 spare.  The Woop form costs ~33 VPU
    #   ops per ray-triangle test vs ~57 for Moller-Trumbore (the cross
    #   products move to the host-side build).  Exactly-128 rows keep DMA
    #   slices tile-aligned and all lane extracts static (Mosaic).
    rows: jnp.ndarray      # (C,) f32 — 8-triangle rows actually used per
    #   page (subtree cuts vary in size; the common cap pads ~34% dead
    #   rows on the staircase, which the sweep kernel skips via this)


def woop_records(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray):
    """Per-triangle Woop transforms (f64 build -> f32): A = [e1 e2 n]^-1,
    c = A @ v0.  For a ray (o, d): s = A@o - c, r = A@d,
    t = -s_z/r_z, u = s_x + t*r_x, v = s_y + t*r_y — t is the *world*
    ray parameter (affine transforms preserve it).  Degenerate triangles
    get A = 0 -> r_z = 0 -> never hit."""
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    n = np.cross(e1, e2)
    m = np.stack([e1, e2, n], axis=-1)          # (M, 3, 3) columns e1 e2 n
    det = np.linalg.det(m)
    # Scale-invariant degeneracy test: det = |n|^2 = (|e1||e2| sin a)^2, so
    # compare |n| against eps*|e1||e2| — a triangle is degenerate when its
    # edges are nearly parallel, regardless of absolute scene scale.
    l1 = np.linalg.norm(e1, axis=-1)
    l2 = np.linalg.norm(e2, axis=-1)
    ok = np.sqrt(np.abs(det)) > 1e-6 * l1 * l2
    m_safe = np.where(ok[:, None, None], m, np.eye(3)[None])
    a = np.linalg.inv(m_safe)
    a = np.where(ok[:, None, None], a, 0.0)     # (M, 3, 3) rows a0 a1 a2
    c = np.einsum("mij,mj->mi", a, v0)
    return a.astype(np.float32), c.astype(np.float32)


def _subtree_ranges(glob, m: int, max_tris: int):
    """Cut the builder's tree into SUBTREE-ALIGNED contiguous prim ranges
    of <= max_tris each.  Subtree-aligned chunks have much tighter AABBs
    than equal-size cuts of the same order (staircase, round 4:
    per-ray chunk candidates mean 8.33 -> 6.30, p99 27 -> 17,
    scripts/r4_treelet_stats.py) at the same chunk count.

    Builder node semantics (native/mitr_native.cpp): leaves have left=-1,
    right=offset into prim_order, count=#prims; inner nodes count=0;
    every subtree owns a contiguous prim_order range.  Iterative: both
    builders allocate child ids after the parent, so one reverse pass
    computes every node's prim range bottom-up (O(n)), and an explicit
    stack walks the cuts — no recursion, no stack-depth hazard."""
    left = np.asarray(glob["left"])
    right = np.asarray(glob["right"])
    count = np.asarray(glob["count"])
    n_nodes = left.shape[0]
    lo_r = np.zeros(n_nodes, np.int64)
    hi_r = np.zeros(n_nodes, np.int64)
    for nid in range(n_nodes - 1, -1, -1):
        if left[nid] < 0:
            lo_r[nid] = right[nid]
            hi_r[nid] = right[nid] + count[nid]
        else:
            lo_r[nid] = min(lo_r[left[nid]], lo_r[right[nid]])
            hi_r[nid] = max(hi_r[left[nid]], hi_r[right[nid]])

    ranges = []
    stack = [0]
    while stack:
        nid = stack.pop()
        a, b = int(lo_r[nid]), int(hi_r[nid])
        if b - a <= max_tris or left[nid] < 0:
            ranges.append((a, b))
        else:
            stack.append(int(right[nid]))
            stack.append(int(left[nid]))
    ranges.sort()
    end = 0
    for a, b in ranges:
        assert a == end, (a, end)
        end = b
    assert end == m, (end, m)
    return ranges


def build_accel(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray) -> Accel:
    """Build chunk pages + AABBs from a triangle soup (host, numpy)."""
    v0 = np.asarray(v0, np.float32)
    e1 = np.asarray(e1, np.float32)
    e2 = np.asarray(e2, np.float32)
    m = v0.shape[0]

    # Global spatial ordering from the median-split builder; chunks are
    # SUBTREE cuts of <= 2*CHUNK_TRIS prims (median splits make them land
    # just above CHUNK_TRIS), padded to a common page size.
    glob = native.build_bvh(v0, e1, e2, leaf_size=8)
    order = np.asarray(glob["prim_order"], np.int64)
    gv0, ge1, ge2 = v0[order], e1[order], e2[order]
    ga, gc = woop_records(gv0, ge1, ge2)

    ranges = _subtree_ranges(glob, m, 2 * CHUNK_TRIS)
    c = len(ranges)
    cap = max(8, -(-max(b - a for a, b in ranges) // 8) * 8)
    tri16 = np.zeros((c, cap, 16), np.float32)
    tri16[:, :, 9] = -1.0
    aabb_min = np.zeros((c, 3), np.float32)
    aabb_max = np.zeros((c, 3), np.float32)
    used_rows = np.zeros((c,), np.float32)
    for ci, (lo, hi) in enumerate(ranges):
        n_i = hi - lo
        used_rows[ci] = -(-n_i // 8)
        tri16[ci, :n_i, 0:9] = ga[lo:hi].reshape(n_i, 9)
        tri16[ci, :n_i, 9] = order[lo:hi].astype(np.float32)
        tri16[ci, :n_i, 10:13] = gc[lo:hi]
        pts = np.concatenate([
            gv0[lo:hi], gv0[lo:hi] + ge1[lo:hi], gv0[lo:hi] + ge2[lo:hi]
        ])
        aabb_min[ci] = pts.min(axis=0)
        aabb_max[ci] = pts.max(axis=0)
    pages = tri16.reshape(c, cap // 8, 128)

    spad = (-c) % SUPER_CHUNKS
    smin = np.concatenate([aabb_min, np.full((spad, 3), 1.0, np.float32)])
    smax = np.concatenate([aabb_max, np.full((spad, 3), -1.0, np.float32)])
    sup_min = smin.reshape(-1, SUPER_CHUNKS, 3).min(axis=1)
    sup_max = smax.reshape(-1, SUPER_CHUNKS, 3).max(axis=1)

    return Accel(
        aabb_min=jnp.asarray(aabb_min),
        aabb_max=jnp.asarray(aabb_max),
        sup_min=jnp.asarray(sup_min),
        sup_max=jnp.asarray(sup_max),
        pages=jnp.asarray(pages),
        rows=jnp.asarray(used_rows),
    )


# ---------------------------------------------------------------------------
# Reference traversal (numpy, for builder/kernel unit tests)
# ---------------------------------------------------------------------------

def closest_hit_reference(accel: Accel, ray_o, ray_d, maxt):
    """Scalar numpy emulation of the binned-pass algorithm — validates the
    chunk structure independently of both the brute-force sweep and the
    Pallas kernels."""
    amin = np.asarray(accel.aabb_min)
    amax = np.asarray(accel.aabb_max)
    pages = np.asarray(accel.pages)
    c = amin.shape[0]
    n_rays = ray_o.shape[0]
    out_t = np.full(n_rays, np.inf, np.float32)
    out_prim = np.full(n_rays, -1, np.int32)

    for r in range(n_rays):
        o = np.asarray(ray_o[r], np.float64)
        d = np.asarray(ray_d[r], np.float64)
        inv_d = 1.0 / np.where(np.abs(d) < 1e-12,
                               np.where(d < 0, -1e-12, 1e-12), d)
        best_t = float(maxt[r])
        best_p = -1
        t0 = (amin - o) * inv_d
        t1 = (amax - o) * inv_d
        tn = np.maximum(np.minimum(t0, t1).max(axis=1), 1e-4)
        tf = np.minimum(np.maximum(t0, t1).min(axis=1), best_t)
        hits = [(tn[ci], ci) for ci in range(c) if tn[ci] <= tf[ci]]
        for entry, ci in sorted(hits):
            if entry >= best_t:
                break
            cap = pages.shape[1] * 8
            tris = pages[ci].reshape(cap, 16)
            for k in range(cap):
                a = tris[k, 0:9].astype(np.float64).reshape(3, 3)
                cc = tris[k, 10:13].astype(np.float64)
                rv = a @ d
                if abs(rv[2]) < 1e-12:
                    continue
                s = a @ o - cc
                tt = -s[2] / rv[2]
                u = s[0] + tt * rv[0]
                v = s[1] + tt * rv[1]
                if (u >= 0.0 and v >= 0.0 and u + v <= 1.0
                        and tt > 1e-4 and tt < best_t):
                    best_t = tt
                    best_p = int(tris[k, 9])
        if best_p >= 0:
            out_t[r] = best_t
            out_prim[r] = best_p
    return out_t, out_prim
