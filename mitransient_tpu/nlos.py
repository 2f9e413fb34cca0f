"""NLOS laser-focus helpers (parity with /root/reference/mitransient/nlos.py).

These update the scene's laser (projector) transform to aim at a point on the
relay wall and record the laser->wall optical path length + target on the
NLOS sensor state, exactly mirroring ``focus_emitter_at_relay_wall_*``
(reference nlos.py:5-70).
"""
from __future__ import annotations

import numpy as np

from .core.transform import Transform4
from .scene.schema import Scene


def focus_emitter_at_relay_wall_3dpoint(target, scene: Scene, emitter="laser"):
    """Aim the projector at ``target`` (world space); store laser_bounce_opl
    and laser_target on the scene (consumed by the NLOS integrator)."""
    em_idx = scene.emitter_index(emitter)
    origin = scene._emitters[em_idx].to_world.translation
    t = Transform4().look_at(origin=origin, target=target, up=[0, 1, 0])
    scene.replace_emitter_transform(em_idx, t)
    target = np.asarray(target, np.float64)
    scene.laser_target = target
    scene.laser_bounce_opl = float(np.linalg.norm(target - origin))
    scene.laser_focused = True
    return scene


def focus_emitter_at_relay_wall_uv(uv, scene: Scene, relay_wall=None,
                                   emitter="laser"):
    """UV on the relay wall -> 3d point -> focus (reference nlos.py:35-47)."""
    wall = _find_relay_wall(scene, relay_wall)
    target = wall.position_from_uv(np.asarray(uv, np.float64))
    return focus_emitter_at_relay_wall_3dpoint(target, scene, emitter)


def focus_emitter_at_relay_wall_pixel(pixel, scene: Scene, relay_wall=None,
                                      emitter="laser"):
    """Film pixel -> uv via the *scan* grid size (confocal uses the virtual
    original_film size, reference nlos.py:50-70 + nloscapturemeter.py:133)."""
    sensor = next(s for s in scene.sensors if s.kind == "nlos_capture_meter")
    sw, sh = sensor.scan_size
    uv = np.asarray([pixel[0] / sw, pixel[1] / sh], np.float64)
    return focus_emitter_at_relay_wall_uv(uv, scene, relay_wall, emitter)


def _find_relay_wall(scene: Scene, relay_wall):
    from .scene.shapes import Rectangle

    if relay_wall is not None:
        idx = scene.shape_index(relay_wall) if isinstance(relay_wall, str) else relay_wall
        return scene.shapes[idx]
    for s_cfg in scene.sensors:
        if s_cfg.kind == "nlos_capture_meter" and s_cfg.shape_index >= 0:
            shape = scene.shapes[s_cfg.shape_index]
            if not isinstance(shape, Rectangle):
                raise TypeError("relay wall must be a rectangle")
            return shape
    raise ValueError("no relay wall (rectangle with nlos_capture_meter) found")


def scan_confocal(scene: Scene, spp=None, seed: int = 0, sensor: int = 0,
                  return_stats: bool = False):
    """Render a WHOLE confocal scan in batched wavefronts (all scan points
    simultaneously, each lane carrying its own focused-laser constants).

    Replaces the reference workflow of looping
    ``focus_emitter_at_relay_wall_pixel`` + ``render`` over the grid
    (1-simple-nlos-scenes.ipynb confocal cell), which pays the NLOS
    prepare's host round trips per point.  Returns (steady (ph, pw, C),
    transient (ph, pw, T, C)) over the virtual grid."""
    from .integrators.nlos_path import render_nlos_confocal_scan

    return render_nlos_confocal_scan(scene, spp=spp, seed=seed,
                                     sensor=sensor,
                                     return_stats=return_stats)
