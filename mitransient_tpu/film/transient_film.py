"""Transient film: time-binned radiance accumulation.

TPU-native equivalent of the reference's ``TransientHDRFilm`` +
``TransientImageBlock`` pair (/root/reference/mitransient/films/
transient_hdr_film.py, render/transient_image_block.py).

Design notes:
* The film state is a plain pytree of dense arrays, carried through the
  wavefront loop and accumulated with XLA scatter-add — the moral equivalent
  of ``dr.scatter_reduce(ReduceOp.Add)`` (transient_image_block.py:79-81).
* Because the spatial reconstruction filter is a box (the only filter the
  reference's transient block supports, transient_image_block.py:150-151),
  the *pixel* of every lane is static; only the *time bin* is dynamic.  The
  transient buffer is laid out ``(H*W, T+1, C)`` with one overflow bin so
  out-of-range samples are routed to a dead slot instead of being masked with
  predication — a branchless pattern that keeps the scatter dense.
* OPL -> bin mapping mirrors transient_hdr_film.py:263-265:
  ``bin = floor((distance - start_opl) / bin_width_opl)``; valid iff
  ``0 <= bin < T``.
* Values are pre-scaled by the per-sample weight (ray_weight / total_spp)
  before splatting, like add_transient_f (common.py:411-422); the weight
  channel is unused for the transient block (add_transient_data passes
  weight=0, transient_hdr_film.py:270-272).
* The steady image accumulates the per-lane total L once per pass
  (common.py:180-206) plus a weight channel that develop() divides by.
* ``temporal_filter='gaussian'`` splats each sample into a small window of
  bins with Gaussian weights (stddev in bins), the transient analogue of the
  reference's gaussian rfilter option (common.py:25-30).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from ..scene.schema import FilmConfig


class TransientFilmState(NamedTuple):
    steady: jnp.ndarray  # (H*W, C) accumulated radiance * filter weight
    steady_weight: jnp.ndarray  # (H*W,) accumulated filter weight
    transient: jnp.ndarray  # (H*W, T+1, C); last bin = overflow (dropped)


def film_init(cfg: FilmConfig, channels: int,
              scan_pixels: int | None = None) -> TransientFilmState:
    hw = scan_pixels if scan_pixels is not None else cfg.width * cfg.height
    return TransientFilmState(
        steady=jnp.zeros((hw, channels), jnp.float32),
        steady_weight=jnp.zeros((hw,), jnp.float32),
        transient=jnp.zeros((hw, cfg.temporal_bins + 1, channels), jnp.float32),
    )


def time_bin(cfg: FilmConfig, distance: jnp.ndarray):
    """OPL -> (bin index, in-range mask)."""
    pos = (distance - cfg.start_opl) / cfg.bin_width_opl
    b = jnp.floor(pos).astype(jnp.int32)
    ok = (pos >= 0.0) & (pos < cfg.temporal_bins)
    return jnp.where(ok, b, cfg.temporal_bins), ok


def splat_transient(
    state: TransientFilmState,
    cfg: FilmConfig,
    pix: jnp.ndarray,  # (N,) int32 linear pixel index
    distance: jnp.ndarray,  # (N,) OPL
    value: jnp.ndarray,  # (N, C) already scaled by sample weight
    active: jnp.ndarray,  # (N,) bool
    temporal_filter: str = "",
    gaussian_stddev: float = 2.0,
) -> TransientFilmState:
    value = jnp.where(active[:, None], value, 0.0)
    if temporal_filter == "gaussian":
        # Gaussian reconstruction along t: window of +-3 sigma around the
        # continuous bin position, weights normalized per sample.
        sigma = gaussian_stddev
        radius = max(1, int(math.ceil(3.0 * sigma)))
        pos = (distance - cfg.start_opl) / cfg.bin_width_opl
        center = jnp.floor(pos)
        tr = state.transient
        offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
        b = center[:, None] + offs[None, :]
        w = jnp.exp(-0.5 * ((b + 0.5 - pos[:, None]) / sigma) ** 2)
        w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-20)
        ok = (b >= 0) & (b < cfg.temporal_bins)
        bidx = jnp.where(ok, b, cfg.temporal_bins).astype(jnp.int32)
        n, K = bidx.shape
        pix2 = jnp.broadcast_to(pix[:, None], (n, K))
        vals = value[:, None, :] * w[:, :, None]
        tr = tr.at[pix2.reshape(-1), bidx.reshape(-1)].add(
            vals.reshape(n * K, -1), mode="drop"
        )
        return state._replace(transient=tr)

    b, _ok = time_bin(cfg, distance)
    tr = state.transient.at[pix, b].add(value, mode="drop")
    return state._replace(transient=tr)


def splat_steady(
    state: TransientFilmState,
    pix: jnp.ndarray,
    value: jnp.ndarray,  # (N, C) unscaled radiance
    weight: jnp.ndarray,  # (N,) filter weight (box: 1)
) -> TransientFilmState:
    return state._replace(
        steady=state.steady.at[pix].add(value * weight[:, None], mode="drop"),
        steady_weight=state.steady_weight.at[pix].add(weight, mode="drop"),
    )


def develop(state: TransientFilmState, cfg: FilmConfig,
            shape_hw: tuple[int, int] | None = None):
    """Returns (steady (H, W, C), transient (H, W, T, C)) — weight-normalized
    steady, transient already scaled at splat time
    (transient_hdr_film.py:210-248)."""
    h, w = shape_hw if shape_hw is not None else (cfg.height, cfg.width)
    C = state.steady.shape[-1]
    wgt = jnp.where(state.steady_weight == 0.0, 1.0, state.steady_weight)
    steady = (state.steady / wgt[:, None]).reshape(h, w, C)
    transient = state.transient[:, : cfg.temporal_bins, :].reshape(
        h, w, cfg.temporal_bins, C
    )
    return steady, transient
