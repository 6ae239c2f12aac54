"""Achromatic-doublet glass recovery (reference report_doublet_exp.ipynb).

The reference's doublet experiment: a 3-surface cemented doublet whose
front glass (sf11 slot) starts with a deliberately wrong Abbe number
(V_d = 0.2 * 64.17) while the rear glass (nbk7) is held fixed.  The rear
surface is solved once for EFL = 50 mm; all surfaces and both refractive
indices are then frozen and ONLY the front glass's V_d is optimized
through the differentiable spectral renderer (chromatic spot blur on the
film plane provides the gradient).  The achromat condition

    P1 / V1 + P2 / V2 = 0     (thin-lens powers P of the two glasses)

gives the analytic optimum V2_exact = -(P2 / P1) * V1 that the
optimization must recover (report_doublet_exp.ipynb get_exact_Vd;
design_problem.py:495-586 drives the loop).

Run: python examples/doublet_achromat_design.py [--iters N] [--spp N]
Outputs: examples/out/doublet_vd_trajectory.json
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from mitsuba_tpu.lens import (
    ConicSurface,
    DesignProblem,
    LensMaterial,
    LensSystem,
)

# doublet prescription (report_doublet_exp.ipynb cell 5)
DOUBLET_SURFS = [
    dict(radial_extent=8.0, c=1.0 / 140.0, z0=48.0),
    dict(radial_extent=8.0, c=-1.0 / 24.0, z0=49.0),
    dict(radial_extent=8.0, c=1.0 / 24.0, z0=52.0),
]
TARGET_EFL = 50.0
V_INIT = 0.2 * 64.17          # deliberately wrong starting Abbe number


def build_doublet(n_rings=8, n_sectors=16):
    surfaces = [
        ConicSurface.create(s["radial_extent"], s["c"], 0.0, s["z0"])
        for s in DOUBLET_SURFS
    ]
    materials = [
        LensMaterial.create("sf11", 1.6447, V_INIT),
        LensMaterial.create("nbk7", 1.5168, V_INIT),
    ]
    ls = LensSystem.create(surfaces, materials, n_rings=n_rings,
                           n_sectors=n_sectors)
    # EFL constraint applied once up front; surfaces stay frozen after
    rear = ls.rear_surface_params_for_EFL(TARGET_EFL)
    s0 = ls.surfaces[0].with_params(rear)
    return ls.replace(surfaces=(s0,) + ls.surfaces[1:])


def exact_vd(ls):
    """Analytic achromat Abbe number for the front glass
    (report_doublet_exp.ipynb get_exact_Vd; thin-lens powers)."""
    inv_c = float(ls.surfaces[0].params["c"])
    inv_b = -float(ls.surfaces[1].params["c"])
    inv_a = float(ls.surfaces[2].params["c"])
    n1 = float(ls.materials[2].ior)       # nbk7 (rear gap)
    v1 = float(ls.materials[2].V_d)
    n2 = float(ls.materials[1].ior)       # sf11 (front gap)
    p1 = (n1 - 1.0) * (inv_a + inv_b)
    p2 = -(n2 - 1.0) * (inv_b + inv_c)
    return -(p2 / p1) * v1


def run(iters=40, spp=2048, resolution=24, lr=0.6, seed=0,
        verbose=True):
    ls = build_doublet()
    v_exact = exact_vd(ls)
    if verbose:
        print(f"EFL = {float(ls.compute_EFL()):.3f} (target {TARGET_EFL})")
        print(f"exact achromat V_d = {v_exact:.3f} (init {V_INIT:.3f})")

    dp = DesignProblem(
        ls, resolution=(resolution, resolution), spp=spp,
        learning_rate=lr, iters=iters, num_sources=1,
        init_camera_z=0.01, seed=seed, spectral=True,
    )
    dp.build()

    # freeze everything except the front glass's Abbe number
    frozen = {k: 0.0 for k in dp.params() if k != "mat_sf11_V_d"}
    vd_hist = []

    def cb(it, p, loss):
        vd_hist.append(float(p["mat_sf11_V_d"]))
        if verbose and it % 5 == 0:
            print(f"iter {it:3d}: loss {loss:9.5f}  "
                  f"V_d {vd_hist[-1]:7.3f}  (exact {v_exact:.3f})")

    p = dp.optimize(lr_overrides=frozen, callback=cb)
    return dict(v_init=V_INIT, v_exact=v_exact,
                v_final=float(p["mat_sf11_V_d"]),
                vd_trajectory=vd_hist, loss=dp.loss_history)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--spp", type=int, default=2048)
    ap.add_argument("--resolution", type=int, default=24)
    ap.add_argument("--lr", type=float, default=0.6)
    args = ap.parse_args()

    out = run(iters=args.iters, spp=args.spp,
              resolution=args.resolution, lr=args.lr)
    os.makedirs(os.path.join(os.path.dirname(__file__), "out"),
                exist_ok=True)
    path = os.path.join(os.path.dirname(__file__), "out",
                        "doublet_vd_trajectory.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    err0 = abs(out["v_init"] - out["v_exact"])
    err1 = abs(out["v_final"] - out["v_exact"])
    print(f"V_d: {out['v_init']:.3f} -> {out['v_final']:.3f} "
          f"(exact {out['v_exact']:.3f}); |error| {err0:.3f} -> "
          f"{err1:.3f}")
    print(f"trajectory written to {path}")


if __name__ == "__main__":
    main()
