"""Command-line renderer: the `mitsuba` binary analogue.

Reference: src/mitsuba/mitsuba.cpp (426 LoC — load XML -> render -> EXR,
with -o output, -D var defines, -s spp/seed overrides).

Usage:
    python -m mitsuba_tpu scene.xml [-o out.exr] [-s SPP] [--seed N]
                                    [-D key=value ...] [--spectral-info]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="mitsuba_tpu",
        description="TPU-native differentiable renderer (Mitsuba-compatible"
                    " scene formats)",
    )
    p.add_argument("scene", help="scene file (.xml) or dict (.json)")
    p.add_argument("-o", "--output", default=None,
                   help="output image (.exr/.png); default <scene>.exr")
    p.add_argument("-s", "--spp", type=int, default=None,
                   help="override samples per pixel")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-D", "--define", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="set an XML $default variable")
    p.add_argument("--sensor", type=int, default=0,
                   help="sensor index (reserved)")
    args = p.parse_args(argv)

    defaults = {}
    for d in args.define:
        k, _, v = d.partition("=")
        defaults[k] = v

    import mitsuba_tpu as mi
    from mitsuba_tpu.utils.bitmap import write_image
    from mitsuba_tpu.utils.xml import load_file

    t0 = time.time()
    if args.scene.endswith(".json"):
        with open(args.scene) as f:
            scene = mi.load_dict(json.load(f))
    else:
        scene = load_file(args.scene, defaults)
    print(f"[mitsuba_tpu] scene loaded in {time.time() - t0:.2f}s "
          f"({len(scene.meshes)} shapes, {len(scene.bsdfs)} bsdfs, "
          f"{len(scene.emitters)} emitters)")

    t0 = time.time()
    img = mi.render(scene, seed=args.seed, spp=args.spp)
    img.block_until_ready()
    print(f"[mitsuba_tpu] rendered in {time.time() - t0:.2f}s")

    out = args.output
    if out is None:
        base = args.scene.rsplit(".", 1)[0]
        out = base + ".exr"
    try:
        write_image(out, img)
    except IOError:
        if out.endswith(".exr"):
            out = out[:-4] + ".png"
            write_image(out, img)
        else:
            raise
    print(f"[mitsuba_tpu] wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
