"""Pallas TPU kernel for transient-film accumulation (time-binned splatting).

The reference's core histogram op is an atomic ``dr.scatter_reduce(Add)``
over (pixel, time-bin) cells (transient_image_block.py:79-81).  XLA's TPU
scatter executes updates ~serially (~90 ns/update measured on v5e), which
made film splatting the dominant cost of a render pass.

TPU-native reformulation: with a box spatial filter the *pixel* of a lane is
static (lane = s*HW + p, spp-major), so a splat is a **per-pixel histogram
over the time axis only**.  The kernel sweeps the T axis: for each time bin
``t`` it reduces ``sum_s val[s, p] * (bin[s, p] == t)`` over the spp axis —
dense, branchless VPU work (O(N * T) compares instead of N serialized
scatters), laid out as (spp, PIXEL_BLOCK) tiles with pixels on the lane
axis.  Two event sets (emitter-hit + NEE splats of one bounce,
transientpath.py:179-218) are fused into one call to halve film traffic.

Film layout: ``(C, T_pad, HW_pad)`` — time on the sublane axis, pixels on
the lane axis — accumulated in place via input/output aliasing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PIXEL_BLOCK = 512


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _splat_kernel(film_ref, bins_a, vals_a, bins_b, vals_b, out_ref,
                  *, n_channels: int, t_pad: int, two_events: bool,
                  n_bins: int):
    """One (pixel-block, spp-chunk) grid step.  The spp axis is split into
    chunks on the grid's inner dimension and the out block is revisited:
    chunk 0 initializes ``out = film + contrib``, later chunks accumulate
    in place — this bounds VMEM at any spp (an NLOS scan has ~1k pixels,
    so a 2^21-lane pass puts 2048 spp rows in one tile otherwise)."""
    j = pl.program_id(1)
    ba = bins_a[...]
    bb = bins_b[...] if two_events else None
    va = [vals_a[c] for c in range(n_channels)]
    vb = [vals_b[c] for c in range(n_channels)] if two_events else None

    # The pixels of a block are spatially coherent, so their bins span a
    # narrow window of the T axis; compute the block's [bin_min, bin_max]
    # (over in-range bins only — bin >= n_bins is the overflow slot, whose
    # rows are sliced away at develop) and skip t-chunks outside it.
    valid_a = ba < n_bins
    bmin = jnp.min(jnp.where(valid_a, ba, t_pad))
    bmax = jnp.max(jnp.where(valid_a, ba, -1))
    if two_events:
        valid_b = bb < n_bins
        bmin = jnp.minimum(bmin, jnp.min(jnp.where(valid_b, bb, t_pad)))
        bmax = jnp.maximum(bmax, jnp.max(jnp.where(valid_b, bb, -1)))
    cmin = bmin // 8
    cmax = bmax // 8

    for tc in range(t_pad // 8):
        in_range = (tc >= cmin) & (tc <= cmax)

        @pl.when(in_range)
        def _accumulate(tc=tc):
            for c in range(n_channels):
                rows = []
                for r in range(8):
                    t = tc * 8 + r
                    contrib = jnp.sum(
                        jnp.where(ba == t, va[c], 0.0), axis=0, keepdims=True
                    )
                    if two_events:
                        contrib = contrib + jnp.sum(
                            jnp.where(bb == t, vb[c], 0.0), axis=0,
                            keepdims=True
                        )
                    rows.append(contrib)
                block = jnp.concatenate(rows, axis=0)  # (8, PIXEL_BLOCK)
                base = jnp.where(
                    j == 0,
                    film_ref[c, tc * 8 : (tc + 1) * 8, :],
                    out_ref[c, tc * 8 : (tc + 1) * 8, :],
                )
                out_ref[c, tc * 8 : (tc + 1) * 8, :] = base + block

        @pl.when(jnp.logical_not(in_range) & (j == 0))
        def _passthrough(tc=tc):
            for c in range(n_channels):
                out_ref[c, tc * 8 : (tc + 1) * 8, :] = film_ref[
                    c, tc * 8 : (tc + 1) * 8, :
                ]


@functools.partial(jax.jit, static_argnames=("spp", "hw", "n_bins"),
                   donate_argnums=(0,))
def splat_accumulate(
    film: jnp.ndarray,  # (C, T_pad, HW_pad) f32
    bins_a: jnp.ndarray,  # (N,) int32, overflow bin = T (in range [0, T_pad))
    vals_a: jnp.ndarray,  # (N, C) f32, already masked/scaled
    bins_b: jnp.ndarray | None,
    vals_b: jnp.ndarray | None,
    *,
    spp: int,
    hw: int,
    n_bins: int | None = None,
):
    """Accumulate one or two splat event sets into the film, in place.

    ``n_bins`` (the live bin count, <= T_pad) enables per-block t-chunk
    skipping; defaults to sweeping everything below the padding slot."""
    C, t_pad, hw_pad = film.shape
    if n_bins is None:
        n_bins = t_pad - 1
    # Split the spp axis into VMEM-sized chunks processed on the grid's
    # inner dimension (the out film block is revisited and accumulated).
    # 128 rows x PIXEL_BLOCK lanes keeps the full working set (film in+out
    # + 2 event sets, each double-buffered by the pipeline) under the 16 MB
    # scoped-VMEM limit with rgb channels and T ~ 400.
    spp_chunk = min(round_up(max(spp, 1), 8), 128)
    n_spp_chunks = (max(spp, 1) + spp_chunk - 1) // spp_chunk
    spp_pad = spp_chunk * n_spp_chunks

    def prep(bins, vals):
        b2 = bins.reshape(spp, hw)
        v2 = jnp.moveaxis(vals.reshape(spp, hw, C), -1, 0)  # (C, spp, hw)
        pad_s = spp_pad - spp
        pad_p = hw_pad - hw
        b2 = jnp.pad(b2, ((0, pad_s), (0, pad_p)), constant_values=t_pad - 1)
        v2 = jnp.pad(v2, ((0, 0), (0, pad_s), (0, pad_p)))
        return b2, v2

    two = bins_b is not None
    ba, va = prep(bins_a, vals_a)
    if two:
        bb, vb = prep(bins_b, vals_b)
    else:
        bb, vb = ba[:spp_chunk, :], va[:, :spp_chunk, :]  # dummies (unused)

    grid = (hw_pad // PIXEL_BLOCK, n_spp_chunks)
    kernel = functools.partial(
        _splat_kernel, n_channels=C, t_pad=t_pad, two_events=two,
        n_bins=n_bins,
    )
    film_spec = pl.BlockSpec(
        (C, t_pad, PIXEL_BLOCK), lambda i, j: (0, 0, i),
        memory_space=pltpu.VMEM,
    )
    bins_spec = pl.BlockSpec(
        (spp_chunk, PIXEL_BLOCK), lambda i, j: (j, i),
        memory_space=pltpu.VMEM,
    )
    dummy_bins_spec = pl.BlockSpec(
        (spp_chunk, PIXEL_BLOCK), lambda i, j: (0, i),
        memory_space=pltpu.VMEM,
    )
    vals_spec = pl.BlockSpec(
        (C, spp_chunk, PIXEL_BLOCK), lambda i, j: (0, j, i),
        memory_space=pltpu.VMEM,
    )
    dummy_vals_spec = pl.BlockSpec(
        (C, spp_chunk, PIXEL_BLOCK), lambda i, j: (0, 0, i),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            film_spec,
            bins_spec,
            vals_spec,
            bins_spec if two else dummy_bins_spec,
            vals_spec if two else dummy_vals_spec,
        ],
        out_specs=film_spec,
        out_shape=jax.ShapeDtypeStruct(film.shape, jnp.float32),
        input_output_aliases={0: 0},
    )(film, ba, va, bb, vb)
