"""Lens-design optimization: field sources + the DesignProblem driver.

Reference: notebooks/scripts/lens_design/design_problem.py [FORK] —
``FieldSource`` (collimated disk + directionalarea emitter per field
angle, small perspective sensor dynamically positioned behind the lens
via the geometric tracer, design_problem.py:12-267); ``DesignProblem``
(two scenes: a prb_basic geometric-tracer scene and a ptracer render
scene :364-420; Adam loop: render per sensor -> RMS spot loss ->
backward -> step -> re-mesh lens geometry :495-586);
``ConstrainedEFLProblem`` (fixed-EFL optimization :656).

TPU design: one jitted loss function closes the whole chain — parameter
pytree -> surfaces/materials -> differentiable re-mesh -> differentiable
ptracer render (lax.scan) -> RMS loss — so jax.grad replaces the
reference's dr.backward through the Dr.Jit graph.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import transform as tf
from ..core.records import Ray
from ..models.bsdfs import SmoothDiffuse
from ..models.emitters import DirectionalAreaEmitter
from ..models.film import Film, ReconstructionFilter
from ..models.integrators import (
    ParticleTracerIntegrator,
    PRBBasicIntegrator,
    render,
)
from ..models.scene import make_scene
from ..models.sensors import PerspectiveCamera
from ..models.shapes import Mesh, disk_mesh, rectangle
from ..models.textures import ConstantTexture
from ..utils.optimizers import Adam
from .lens_system import LensSystem
from .losses import rms_loss

_F32 = lambda x: np.asarray(x, np.float32)


class FieldSource:
    """One collimated field-angle source + its spot-observing sensor
    (design_problem.py:12-267)."""

    def __init__(self, name, origin, target, radius, resolution=(64, 64),
                 fov=45.0, init_camera_z=0.9, radiance=0.05):
        self.name = name
        self.origin = np.asarray(origin, np.float32)
        self.target = np.asarray(target, np.float32)
        self.radius = float(radius)
        self.resolution = resolution
        self.fov = fov
        self.init_camera_z = init_camera_z
        self.radiance = radiance
        self.camera_pos = None

    def central_ray(self, n_probe: int = 9):
        """Chief ray plus a small probe bundle (lateral offsets of
        ~1e-3 radius around the axis).  The exact chief ray can pass
        through the shared central VERTEX of the tessellated surface
        fans, where a non-watertight Moller-Trumbore test may miss every
        triangle (the reference relies on Embree's watertight traversal
        here); the off-axis probes are immune, and the film position is
        averaged over whichever lanes transmit."""
        d = self.target - self.origin
        d = d / np.linalg.norm(d)
        # orthonormal lateral frame
        up = np.array([0.0, 1.0, 0.0], np.float32)
        t1 = np.cross(d, up)
        t1 /= max(np.linalg.norm(t1), 1e-12)
        t2 = np.cross(d, t1)
        ang = np.linspace(0.0, 2 * np.pi, n_probe - 1, endpoint=False)
        eps = 1e-3 * self.radius
        offs = np.concatenate(
            [np.zeros((1, 3), np.float32),
             (eps * (np.cos(ang)[:, None] * t1[None]
                     + np.sin(ang)[:, None] * t2[None])).astype(np.float32)])
        o = self.origin[None] + offs
        dirs = self.target[None] - o
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        return Ray.make(jnp.asarray(o), jnp.asarray(dirs))

    def source_mesh_emitter(self, emitter_index):
        """Disk + directionalarea emitter aimed at ``target``
        (design_problem.py:57-69)."""
        look = tf.look_at(self.origin, self.target, [0, 1, 0])
        m = np.asarray(tf.compose(look, tf.scale(self.radius)), np.float32)
        mesh = Mesh.make(
            *disk_mesh(n_seg=32, to_world=m),
            bsdf_index=0,  # black
            emitter_index=emitter_index,
            id=f"source_{self.name}",
        )
        em = DirectionalAreaEmitter(
            radiance=ConstantTexture(jnp.full((3,), self.radiance))
        )
        return mesh, em

    def make_sensor(self, geo_tracer, lens_system):
        """Position the spot camera using the central geometric ray
        (design_problem.py:192-247 get_sensor_dict)."""
        _, _, valid, film_p = geo_tracer(self.central_ray())
        valid = np.asarray(valid)
        if not valid.any():
            raise AssertionError(
                f"source {self.name}: central ray was not transmitted")
        film_p = np.asarray(film_p)[valid].mean(axis=0)
        near_clip = min(0.005, float(lens_system.rear_z) * 0.1)
        z_cam = max(self.init_camera_z * float(lens_system.rear_z),
                    1.1 * near_clip)
        self.camera_pos = np.array([film_p[0], film_p[1], z_cam], np.float32)
        to_world = tf.look_at(
            self.camera_pos,
            [self.camera_pos[0], self.camera_pos[1], -1.0],
            [0, 1, 0],
        )
        film = Film(width=self.resolution[0], height=self.resolution[1],
                    rfilter=ReconstructionFilter.tent())
        return PerspectiveCamera(
            to_world=jnp.asarray(to_world), film=film, fov=self.fov,
            near_clip=near_clip, far_clip=z_cam + 1.0,
        )


def accumulate_sensor_grads(grad_fns, p, seed, retries=2):
    """Sum per-sensor value_and_grad results, redrawing non-finite ones.

    Per-sensor gradients with non-finite leaves come from pathological
    MC lanes (grazing TIR through strongly aspheric surfaces); with k
    sensors each having independent probability q of such a draw, an
    all-or-nothing guard accepts only (1-q)^k of steps — measured 15%
    late in the round-5 Nikon run.  Dropping just the offending sensor
    keeps steps flowing but is NOT harmless: the drops concentrate on
    exactly the hardest (widest-field) sensors, which therefore receive
    systematically fewer updates — the round-5 run left its two widest
    fields under-optimized this way.  So each non-finite sensor is
    first RESAMPLED with a fresh decorrelated seed up to ``retries``
    times (a redraw is usually finite; the surviving estimate is still
    that sensor's unbiased-up-to-conditioning MC gradient) and only
    dropped if every redraw fails.  Upscaling surviving gradients by
    n_sens/n_used was tried and DIVERGED (round-5 log, iters 119-129:
    biased direction + spiked effective step size); survivors are used
    unscaled.

    Returns (value_sum, grad_sum, used) where ``used`` is a per-sensor
    bool list; (nan-free) g is None when no sensor survived.
    """
    val, g = None, None
    used = []
    for si, fn in enumerate(grad_fns):
        ok = False
        v = gi = None
        for r in range(1 + retries):
            # decorrelate retries from the base seed AND from other
            # iterations' seeds (which advance by +1 per step): large
            # odd strides far above any iteration count
            s = seed if r == 0 else seed + 1000003 * r + 7919 * si
            v, gi = fn(p, s)
            ok = all(bool(jnp.isfinite(leaf).all())
                     for leaf in jax.tree_util.tree_leaves(gi))
            if ok:
                break
        used.append(ok)
        if not ok:
            continue
        if g is None:
            val, g = v, gi
        else:
            val = val + v
            g = jax.tree_util.tree_map(jnp.add, g, gi)
    return val, g, used


class DesignProblem:
    """End-to-end lens optimization (design_problem.py:280-654)."""

    def __init__(self, lens_system: LensSystem, resolution=(64, 64),
                 spp=256, learning_rate=2e-3, iters=50,
                 film_diagonal=35.0, num_sources=1, max_field_angle=5.0,
                 init_camera_z=0.9, loss_scale=1e4, seed=0,
                 sensor_fov=45.0, spectral=None, grad_retries=2):
        self.lens_system = lens_system
        self.resolution = resolution
        self.spp = spp
        self.lr = learning_rate
        self.iters = iters
        self.film_diagonal = film_diagonal
        self.num_sources = num_sources
        self.max_field_angle = max_field_angle
        self.init_camera_z = init_camera_z
        self.loss_scale = loss_scale
        self.seed = seed
        self.sensor_fov = sensor_fov
        # spectral light tracing: auto-on when the lens has glass, so
        # dispersion (V_d) contributes chromatic spot error and gets
        # gradients; pass False to force monochromatic (d-line) tracing
        self.spectral = (
            any(not m.is_air for m in lens_system.materials)
            if spectral is None else bool(spectral)
        )
        self.loss_history = []
        # per-sensor non-finite-gradient redraws before dropping the
        # sensor from a step (see accumulate_sensor_grads); the round-5
        # Nikon run showed silent drops concentrate on exactly the
        # hardest (TIR-grazing) fields, leaving them under-optimized
        self.grad_retries = grad_retries
        self.sensor_drops = []

    # ------------------------------------------------------------ scene

    def _film_plane_mesh(self):
        """White screen at z=0 (design_problem.py:382-396)."""
        m = np.asarray(
            tf.compose(tf.scale([self.film_diagonal, self.film_diagonal, 1.0])),
            np.float32,
        )
        return Mesh.make(*rectangle(m), bsdf_index=1, id="film_plane")

    def _sources(self):
        """Evenly spaced field angles aiming at the ENTRANCE PUPIL
        (FieldSource.createSourceArray, design_problem.py:143-182): the
        central ray of every source is the chief ray through the
        aperture-stop center, so it is transmitted even for wide-angle
        prescriptions; the source distance keeps adjacent source disks
        from overlapping (1.1 r / tan(dtheta/2))."""
        ls = self.lens_system
        front_z = float(ls.front_z)
        radius = float(ls.front_radial_extent)
        _, z_entrance, _, _ = ls.compute_pupils()
        pupil = np.array([0.0, 0.0, float(z_entrance)], np.float32)
        angles = (
            [0.0] if self.num_sources == 1
            else list(np.linspace(0.0, self.max_field_angle,
                                  self.num_sources))
        )
        if self.num_sources > 1:
            dtheta = np.deg2rad(self.max_field_angle) / \
                (self.num_sources - 1)
            dist = 1.1 * radius / np.tan(0.5 * dtheta)
        else:
            dist = max(10.0, 1.1 * front_z)
        srcs = []
        for k, ang in enumerate(angles):
            th = np.deg2rad(ang)
            origin = pupil + dist * np.array(
                [np.sin(th), 0.0, np.cos(th)], np.float32)
            srcs.append(FieldSource(
                name=str(k), origin=origin, target=pupil,
                radius=radius,
                resolution=self.resolution,
                fov=self.sensor_fov,
                init_camera_z=self.init_camera_z,
            ))
        return srcs

    def build(self):
        """Construct lens meshes, the geo tracer, sources and sensors."""
        ls = self.lens_system
        black = SmoothDiffuse(reflectance=ConstantTexture(jnp.zeros(3)))
        white = SmoothDiffuse(reflectance=ConstantTexture(jnp.ones(3)))

        lens_meshes, lens_bsdfs, templates = ls.build_elements(bsdf_offset=2)
        self.templates = templates
        self.n_base_meshes = 1  # film plane before lens meshes
        base_bsdfs = [black, white]

        film_plane = self._film_plane_mesh()

        # geometric-tracer scene (prb_basic; design_problem.py:416)
        geo_meshes = [film_plane] + lens_meshes
        dummy_cam = PerspectiveCamera(to_world=jnp.eye(4))
        geo_scene = make_scene(geo_meshes, base_bsdfs + lens_bsdfs, [],
                               dummy_cam, use_bvh=False)
        trace_depth = ls.size() + 1
        geo_integ = PRBBasicIntegrator(max_depth=trace_depth + 2)
        geo_tracer = lambda ray: geo_integ.trace(geo_scene, ray, trace_depth)
        self.geo_scene = geo_scene
        self.geo_tracer = geo_tracer

        # render scene: film plane + lenses + sources; one scene per sensor
        self.sources = self._sources()
        emitters = []
        src_meshes = []
        for s in self.sources:
            mesh, em = s.source_mesh_emitter(len(emitters))
            src_meshes.append(mesh)
            emitters.append(em)
        self.sensors = [s.make_sensor(geo_tracer, ls) for s in self.sources]

        meshes = [film_plane] + lens_meshes + src_meshes
        self.base_scene = make_scene(
            meshes, base_bsdfs + lens_bsdfs, emitters, self.sensors[0],
            use_bvh=False,
            integrator=ParticleTracerIntegrator(
                max_depth=ls.size() + 2, rr_depth=64,
                spectral=self.spectral),
        )
        return self

    # ------------------------------------------------------- optimization

    def params(self):
        """Differentiable parameter pytree: per-surface shape params +
        per-material glass params (LensSystem.add_to_optimizer)."""
        p = {}
        for i, s in enumerate(self.lens_system.surfaces):
            for k, v in s.params.items():
                p[f"lens{i}_{k}"] = v
        for m in self.lens_system.materials:
            if not m.is_air:
                p[f"mat_{m.name}_ior"] = m.ior
                p[f"mat_{m.name}_V_d"] = m.V_d
        return p

    def apply_params(self, p):
        """Parameter pytree -> new LensSystem (functional update)."""
        ls = self.lens_system
        surfaces = []
        for i, s in enumerate(ls.surfaces):
            upd = {k: p[f"lens{i}_{k}"] for k in s.params
                   if f"lens{i}_{k}" in p}
            surfaces.append(s.with_params(upd))
        materials = []
        for m in ls.materials:
            if m.is_air or f"mat_{m.name}_ior" not in p:
                materials.append(m)
            else:
                materials.append(m.replace(
                    ior=p[f"mat_{m.name}_ior"], V_d=p[f"mat_{m.name}_V_d"]
                ))
        return ls.replace(surfaces=tuple(surfaces),
                          materials=tuple(materials))

    def scene_for(self, p, sensor_index):
        """Differentiable scene reconstruction from params."""
        ls = self.apply_params(p)
        scene = self.base_scene
        meshes = ls.remesh(list(scene.meshes), self.templates,
                           mesh_offset=self.n_base_meshes)
        bsdfs = ls.update_bsdfs(list(scene.bsdfs), bsdf_offset=2)
        return scene.replace(
            meshes=tuple(meshes), bsdfs=tuple(bsdfs),
            sensor=self.sensors[sensor_index],
        ), ls

    def loss(self, p, seed):
        total = 0.0
        for si in range(len(self.sensors)):
            scene, _ = self.scene_for(p, si)
            img = render(scene, seed=seed, spp=self.spp)
            total = total + self.loss_scale * rms_loss(img)
        return total / len(self.sensors)

    def optimize(self, fixed_efl=None, verbose=False, lr_overrides=None,
                 callback=None, train_keys=None, checkpoint_path=None,
                 checkpoint_every=10, split_jits=None):
        """Adam loop (design_problem.py:495-586).  ``fixed_efl``: hold the
        effective focal length by solving the rear surface per step
        (ConstrainedEFLProblem, :656).  ``lr_overrides``: per-parameter
        learning rates (Optimizer.set_learning_rate).  ``callback``:
        called as callback(iter, params, loss) after each step (the
        reference's save_var_history, :495).  ``train_keys``: restrict
        the optimizer to this parameter subset; everything else is a
        frozen constant — the reference's disable_all_materials /
        disable_surface_vars freezing (report_nikon_exp.ipynb cell 14)
        without paying gradients for the frozen leaves.
        ``checkpoint_path``: resumable optimization via
        utils.elastic.CheckpointedLoop — a killed run continues from
        the last saved (params, opt state, step); seeds derive from the
        step index so the resumed trajectory is identical.
        ``split_jits``: compile ONE value_and_grad per sensor and
        accumulate gradients host-side instead of jitting the summed
        loss — mathematically identical (the loss is a mean of
        per-sensor terms and grad distributes over the sum), but each
        compile request is ~1/num_sensors the graph, which keeps
        many-surface problems under remote-compile duration caps
        (PERF.md round-4: the 22-surface Nikon grad graph as one jit
        exceeded the tunnel's cap four times).  Default: on when there
        is more than one sensor."""
        p = self.params()
        if fixed_efl is not None:
            p.pop("lens0_c", None)
            p.pop("lens0_z0", None)
        frozen = {}
        if train_keys is not None:
            missing = set(train_keys) - set(p)
            if missing:
                raise KeyError(f"unknown train_keys: {sorted(missing)}")
            frozen = {k: jax.lax.stop_gradient(v) for k, v in p.items()
                      if k not in train_keys}
            p = {k: p[k] for k in train_keys}

        def full_params(p):
            p = {**frozen, **p}
            if fixed_efl is not None:
                ls = self.apply_params(p)
                rear = ls.rear_surface_params_for_EFL(fixed_efl)
                p = dict(p)
                p["lens0_c"] = rear["c"]
                p["lens0_z0"] = rear["z0"]
            return p

        def loss_fn(p, seed):
            return self.loss(full_params(p), seed)

        n_sens = len(self.sensors)
        if split_jits is None:
            split_jits = n_sens > 1
        if split_jits:
            def loss_si(p, seed, si):
                pf = full_params(p)
                scene, _ = self.scene_for(pf, si)
                img = render(scene, seed=seed, spp=self.spp)
                return self.loss_scale * rms_loss(img) / n_sens

            grad_fns = [
                jax.jit(jax.value_and_grad(
                    lambda p, seed, si=si: loss_si(p, seed, si)))
                for si in range(n_sens)
            ]

            self.sensor_drops = [0] * n_sens

            def grad_fn(p, seed):
                val, g, used = accumulate_sensor_grads(
                    grad_fns, p, seed, retries=self.grad_retries)
                for si, u in enumerate(used):
                    if not u:
                        self.sensor_drops[si] += 1
                quorum = max(1, (2 * n_sens + 2) // 3)
                if g is None or sum(used) < quorum:   # skip this step
                    nan = jnp.full((), jnp.nan)
                    return nan, jax.tree_util.tree_map(
                        lambda x: jnp.full_like(x, jnp.nan), p)
                return val, g
        else:
            grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        opt = Adam(lr=self.lr)
        if lr_overrides:
            opt.set_learning_rate(lr_overrides)
        state = opt.init(p)
        from ..utils.elastic import nan_guard_step

        start = 0
        loop = None
        if checkpoint_path is not None:
            from ..utils.elastic import CheckpointedLoop

            loop = CheckpointedLoop(checkpoint_path,
                                    every=checkpoint_every)
            p, state, start = loop.resume(p, state)

        for it in range(start, self.iters):
            val, g = grad_fn(p, self.seed + it)
            # a single pathological lane (grazing TIR, degenerate
            # normal) can NaN the whole MC gradient; skipping the step
            # redraws with the next seed instead of poisoning Adam
            p, state, ok = nan_guard_step(opt, p, g, state)
            self.loss_history.append(float(val))
            if loop is not None:
                loop.maybe_save(it, p, state,
                                metric=float(val))
            if callback is not None:
                callback(it, p, float(val))
            if verbose:
                print(f"iter {it:3d}: loss = {float(val):.5f}"
                      + ("" if ok else "  [step skipped: non-finite]"))
        if fixed_efl is not None:
            ls = self.apply_params(p)
            rear = ls.rear_surface_params_for_EFL(fixed_efl)
            p["lens0_c"] = rear["c"]
            p["lens0_z0"] = rear["z0"]
        self.final_params = p
        self.lens_system = self.apply_params(p)
        return p
