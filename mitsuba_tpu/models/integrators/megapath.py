"""Megakernel path-tracer integrator (Pallas, TPU).

Drop-in replacement for PathIntegrator on scenes within the megakernel's
plugin subset (diffuse surfaces + one constant-radiance area light — see
ops/pallas/megakernel.py).  Draws the SAME sample sequence as the
wavefront path, so images agree to float rounding; use it for primal
speed (the bench headline), the wavefront path for everything else.

``strict=False`` (default) silently falls back to PathIntegrator when
the scene is out of scope, so ``render(scene, MegakernelPathIntegrator())``
is always safe.
"""
from __future__ import annotations

import jax

from ...core.pytree import pytree, static
from ...ops.pallas.megakernel import (
    megakernel_applicable,
    megakernel_bvh_applicable,
    megakernel_trace,
    megakernel_trace_bvh,
    pack_scene,
    pack_scene_bvh,
)
from .path import PathIntegrator


@pytree
class MegakernelPathIntegrator:
    max_depth: int = static(6)
    rr_depth: int = static(5)
    strict: bool = static(False)
    id: str = static("megapath")

    def sample(self, scene, ray, lane, seed, active):
        brute = megakernel_applicable(scene)
        if not brute and not megakernel_bvh_applicable(scene):
            if self.strict:
                raise ValueError("scene outside megakernel plugin subset")
            return PathIntegrator(
                max_depth=self.max_depth, rr_depth=self.rr_depth
            ).sample(scene, ray, lane, seed, active)
        from ...models.bsdfs import SmoothDiffuse

        interpret = jax.default_backend() != "tpu"
        multi = any(not isinstance(b, SmoothDiffuse) for b in scene.bsdfs)
        if brute:
            tris, light, n_faces, n_lights = pack_scene(scene)
            return megakernel_trace(
                tris, light, lane, ray.o, ray.d, active, seed,
                max_depth=self.max_depth, rr_depth=self.rr_depth,
                n_faces=n_faces, n_lights=n_lights, multi=multi,
                interpret=interpret,
            )
        acc = scene.packet_accel
        rows, light, n_lights = pack_scene_bvh(scene, acc)
        return megakernel_trace_bvh(
            acc.node_box, acc.node_meta, rows, light,
            lane, ray.o, ray.d, active, seed,
            max_depth=self.max_depth, rr_depth=self.rr_depth,
            n_nodes=acc.n_nodes, n_lights=n_lights, multi=multi,
            interpret=interpret,
        )
