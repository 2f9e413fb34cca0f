"""Simple NLOS scenes: single, confocal, and exhaustive captures of a
hidden Z shape behind a relay wall.

Mirrors `transient-nlos/1-simple-nlos-scenes.ipynb` (reference examples):
build the NLOS setup from the Python interface — relay wall + nlos capture
meter, a laser `projector` focused with the ``mitransient_tpu.nlos``
helpers, and a hidden Z-shaped target — then run the three capture modes of
the ``transient_nlos_path`` integrator.

    python examples/transient_nlos/simple_nlos_scenes.py [--quick]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np

from common import example_args, save_image

import mitransient_tpu as mitr


def z_bar(key, translate, scale, angle=0.0):
    """One bar of the hidden Z: a rectangle facing the relay wall (-z)."""
    return {
        "type": "rectangle",
        # chained op list (Mitsuba <transform> semantics): translate o
        # rotate(z) o flip toward the wall o scale
        "to_world": [
            {"translate": translate},
            {"rotate": {"axis": [0, 0, 1], "angle": angle}},
            {"rotate": {"axis": [0, 1, 0], "angle": 180}},
            {"scale": scale},
        ],
        "bsdf": {"type": "diffuse",
                 "reflectance": {"type": "rgb", "value": [1.0, 1.0, 1.0]}},
    }


def nlos_scene(sx, sy, bins, capture="single"):
    """NLOS setup per the reference's documentation
    (/root/reference/examples/README.md "Documentation: NLOS rendering"):
    relay wall rectangle + nlos_capture_meter, laser projector, hidden Z."""
    d = {
        "type": "scene",
        "integrator": {
            "type": "transient_nlos_path",
            "max_depth": 4,
            "nlos_laser_sampling": True,
            "nlos_hidden_geometry_sampling": True,
            "nlos_hidden_geometry_sampling_do_rroulette": False,
            "temporal_filter": "box",
        },
        # hidden Z at z=1 (three bars)
        "z-top": z_bar("t", [0.0, 0.35, 1.0], [0.35, 0.1, 1.0]),
        "z-mid": z_bar("m", [0.0, 0.0, 1.0], [0.38, 0.09, 1.0], angle=45.0),
        "z-bot": z_bar("b", [0.0, -0.35, 1.0], [0.35, 0.1, 1.0]),
        "laser": {
            "type": "projector",
            "to_world": {"translate": [-0.5, 0.0, 0.25]},
            "irradiance": {"type": "rgb", "value": [1.0, 1.0, 1.0]},
            "fov": 0.2,
        },
        "relay_wall": {
            "type": "rectangle",
            "bsdf": {"type": "diffuse",
                     "reflectance": {"type": "rgb",
                                     "value": [1.0, 1.0, 1.0]}},
            "nlos_sensor": {
                "type": "nlos_capture_meter",
                "sampler": {"type": "independent", "sample_count": 64},
                "sensor_origin": [-0.5, 0.0, 0.25],
                "film": {
                    "type": "transient_hdr_film",
                    "width": sx, "height": sy,
                    "temporal_bins": bins,
                    "bin_width_opl": 0.02,
                    "start_opl": 0.0,
                },
            },
        },
    }
    if capture == "confocal":
        d["relay_wall"]["nlos_sensor"]["original_film_width"] = sx
        d["relay_wall"]["nlos_sensor"]["original_film_height"] = sy
        d["relay_wall"]["nlos_sensor"]["film"]["width"] = 1
        d["relay_wall"]["nlos_sensor"]["film"]["height"] = 1
    elif capture == "exhaustive":
        d["integrator"]["capture_type"] = "exhaustive"
        film = d["relay_wall"]["nlos_sensor"]["film"]
        film["exhaustive_scan"] = True
        film["laser_scan_width"] = sx
        film["laser_scan_height"] = sy
    return d


def main():
    args = example_args("simple_nlos", __doc__)
    # bin range must cover the 3-bounce arrivals (~OPL 3.1-3.5 here)
    sx, bins, spp = (8, 200, 64) if args.quick else (32, 300, 25_000)
    spp = args.spp or spp

    # ---- single illumination: one laser point, sx x sy scan --------------
    scene = mitr.load_dict(nlos_scene(sx, sx, bins))
    mitr.nlos.focus_emitter_at_relay_wall_pixel([sx / 2, sx / 2], scene)
    _s, transient = mitr.render(scene, spp=spp, seed=0)
    tr = np.asarray(transient)  # (sy, sx, T, C)
    print(f"single: transient {tr.shape}, energy {tr.sum():.4f}")
    # time-integrated view of the scan grid
    save_image(os.path.join(args.out, "single_integrated.png"),
               tr.sum(axis=2))

    # ---- confocal: laser follows the scan point (1x1 virtual film) -------
    scene_c = mitr.load_dict(nlos_scene(sx, sx, bins, capture="confocal"))
    mitr.nlos.focus_emitter_at_relay_wall_pixel([sx / 2, sx / 2], scene_c)
    _s, tr_c = mitr.render(scene_c, spp=spp, seed=0)
    tr_c = np.asarray(tr_c)
    print(f"confocal: transient {tr_c.shape}, energy {tr_c.sum():.4f}")

    # ---- exhaustive: every (laser, sensor) pair --> 6-D film -------------
    ex = 2 if args.quick else 4
    scene_e = mitr.load_dict(nlos_scene(ex, ex, bins, capture="exhaustive"))
    mitr.nlos.focus_emitter_at_relay_wall_pixel([ex / 2, ex / 2], scene_e)
    _s, tr_e = mitr.render(scene_e, spp=min(spp, 5000), seed=0)
    tr_e = np.asarray(tr_e)
    print(f"exhaustive: transient {tr_e.shape} (lx, ly, sx, sy, T, C), "
          f"energy {tr_e.sum():.4f}")
    print("wrote", args.out)


if __name__ == "__main__":
    main()
