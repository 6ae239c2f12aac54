"""Mesh-based optimizable lens system.

Reference: notebooks/scripts/lens_design/lens.py:252-1333 [FORK] —
``LensMaterial`` (differentiable n_d/Abbe glass), ``LensElement``
(surface mesh + baffle; optimizer step -> recompute sag -> new vertex
positions, lens.py:509), ``ApertureElement``, ``LensSystem`` (ordered
elements, paraxial ray-transfer-matrix analysis: EFL/BFL/FFL and pupils,
lens.py:752-968; ``fixed_EFL`` constrained rear-surface solve :1023).

Functional TPU design: the system is a pytree whose surface/material
parameters are differentiable leaves.  ``build_elements()`` produces the
meshes + dispersive BSDFs once (fixed x/y templates); ``remesh(scene)``
re-evaluates the differentiable sag at the stored templates and swaps the
vertex arrays into the scene — the JAX analogue of the reference's
vertex_positions scatter + BVH rebuild flow.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.pytree import pytree, static
from ..models.bsdfs import DispersiveDielectric, SmoothDiffuse
from ..models.shapes import Mesh
from ..models.textures import ConstantTexture
from .geometry import create_surface_geometry, polar_disk

_F = lambda x: jnp.asarray(x, jnp.float32)


@pytree
class LensMaterial:
    ior: jnp.ndarray   # () n_d — differentiable (lens.py:252)
    V_d: jnp.ndarray   # () Abbe number
    name: str = static("air")

    @staticmethod
    def create(name="air", ior=1.000277, V_d=0.0):
        return LensMaterial(ior=_F(ior), V_d=_F(V_d), name=name)

    @property
    def is_air(self):
        return self.name == "air"


AIR = LensMaterial.create()


def _sag_normals(surface, xy):
    """Exact (differentiable) vertex normals from the sag gradient.

    n propto (dz/dx, dz/dy, -1), oriented film-side (-z) to match the
    flipped winding.  Smooth shading normals make coarse lens meshes
    optically exact — the TPU replacement for the reference's very fine
    tessellation (SUBDIV_LEVELS=7, lens.py:776)."""
    import jax

    g = jax.vmap(jax.grad(lambda p: surface.sag(p[0], p[1])))(xy)
    n = jnp.concatenate([g, -jnp.ones((xy.shape[0], 1))], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


@pytree
class LensSystem:
    surfaces: tuple          # film -> world order (rear first)
    materials: tuple         # len = len(surfaces)+1; materials[0] = air
    aperture_index: int = static(-1)
    n_rings: int = static(12)
    n_sectors: int = static(24)
    baffle_scale: float = static(1.1)

    @staticmethod
    def create(surfaces, materials, aperture_index=None, n_rings=12,
               n_sectors=24):
        """materials: per-gap glass list of length len(surfaces)-1
        (lens.py:769: air is prepended on the film side)."""
        mats = (AIR,) + tuple(materials)
        if aperture_index is None or aperture_index < 0:
            aperture_index = -1
        return LensSystem(
            surfaces=tuple(surfaces), materials=mats,
            aperture_index=aperture_index, n_rings=n_rings,
            n_sectors=n_sectors,
        )

    # ------------------------------------------------------------ basics

    @property
    def rear_z(self):
        return self.surfaces[0].z0

    @property
    def front_z(self):
        return self.surfaces[-1].z0

    @property
    def front_radial_extent(self):
        return self.surfaces[-1].radial_extent

    def size(self):
        n = len(self.surfaces)
        return n - 1 if self.aperture_index >= 0 else n

    def _mat(self, i):
        """Material of the gap film-side of surface i (cyclic like the
        reference: the world side of the last surface is air)."""
        return self.materials[i % len(self.materials)]

    # ------------------------------------------------- paraxial analysis

    def _elem_matrices(self, idx):
        """(lens_matrix, transit_matrix) for surface idx (lens.py:810-840).
        Paraxial state is (y, u); matrices are (2,2) jnp arrays."""
        z_prev = 0.0 if idx == 0 else self.surfaces[idx - 1].z0
        thickness = self.surfaces[idx].z0 - z_prev
        curvature = -self.surfaces[idx].curvature()
        ior_i = self._mat(idx).ior
        ior_f = self._mat(idx + 1).ior
        m10 = -(ior_f - ior_i) * curvature / ior_f
        m11 = ior_i / ior_f
        lens_m = jnp.asarray([[1.0, 0.0], [0.0, 0.0]]) \
            + jnp.asarray([[0.0, 0.0], [1.0, 0.0]]) * m10 \
            + jnp.asarray([[0.0, 0.0], [0.0, 1.0]]) * m11
        transit = jnp.asarray([[1.0, 0.0], [0.0, 1.0]]) \
            + jnp.asarray([[0.0, 1.0], [0.0, 0.0]]) * thickness
        return lens_m, transit

    def paraxial_matrices(self):
        """(M_film2front, M_rear2front, M_film2ap, M_ap2front)
        (lens.py:810-884 compute_paraxial_quantities)."""
        eye = jnp.eye(2)
        M_f2f = eye
        M_r2f = eye
        M_f2a = eye
        M_a2f = eye
        ap = self.aperture_index if self.aperture_index >= 0 \
            else len(self.surfaces) - 1
        for idx in range(len(self.surfaces)):
            lens_m, transit = self._elem_matrices(idx)
            elem = lens_m @ transit
            M_f2f = elem @ M_f2f
            if idx < ap:
                M_f2a = elem @ M_f2a
            elif idx == ap:
                M_f2a = transit @ M_f2a
                M_a2f = lens_m @ M_a2f
            else:
                M_a2f = elem @ M_a2f
            M_r2f = (lens_m if idx == 0 else elem) @ M_r2f
        return M_f2f, M_r2f, M_f2a, M_a2f

    def compute_EFL(self):
        _, M, _, _ = self.paraxial_matrices()
        return -1.0 / M[1, 0]

    def compute_BFL(self):
        _, M, _, _ = self.paraxial_matrices()
        return -M[1, 1] / M[1, 0]

    def compute_FFL(self):
        _, M, _, _ = self.paraxial_matrices()
        return -M[0, 0] / M[1, 0]

    def compute_pupils(self):
        """(z_exit, z_entrance, r_exit, r_entrance) (lens.py:932-968)."""
        _, _, M_rear, M_front = self.paraxial_matrices()
        z_exit = M_rear[0, 1] / M_rear[0, 0]
        z_entrance = self.front_z - M_front[0, 1] / M_front[1, 1]
        ap = self.aperture_index if self.aperture_index >= 0 \
            else len(self.surfaces) - 1
        ap_radius = self.surfaces[ap].radial_extent
        return (z_exit, z_entrance,
                ap_radius / M_rear[0, 0], ap_radius / M_front[1, 1])

    def trace_paraxial_front2film(self, yu):
        """Paraxial (y, u) trace front -> film (lens.py trace_paraxial...)."""
        M_f2f, _, _, _ = self.paraxial_matrices()
        det = M_f2f[0, 0] * M_f2f[1, 1] - M_f2f[0, 1] * M_f2f[1, 0]
        inv = jnp.asarray(
            [[M_f2f[1, 1], -M_f2f[0, 1]], [-M_f2f[1, 0], M_f2f[0, 0]]]
        ) / det
        return inv @ yu

    def get_EFL_paraxial_matrix(self):
        """Matrix from surface 1 (skipping the rear) to front
        (lens.py:888-918 — used by the fixed-EFL constraint)."""
        eye = jnp.eye(2)
        M = eye
        for idx in range(1, len(self.surfaces)):
            lens_m, transit = self._elem_matrices(idx)
            M = (lens_m if idx == 1 else lens_m @ transit) @ M
        return M

    def rear_surface_params_for_EFL(self, f):
        """Constrained rear-surface (c, z0) enforcing EFL == f and focus
        on the film plane (lens.py:1023 get_rear_surface_params)."""
        Mk = self.get_EFL_paraxial_matrix()
        C, D = Mk[1, 0], Mk[1, 1]
        n1 = self._mat(0).ior
        n2 = self._mat(1).ior
        k = n1 / n2
        z2 = self.surfaces[1].z0
        surf_z0 = f * k * (C * z2 + D) / (1.0 + f * k * C)
        surf_c = -(1.0 / f + C) / ((C * (z2 - surf_z0) + D) * (1.0 - k))
        return {"c": surf_c * self.surfaces[0].radial_extent,
                "z0": surf_z0}

    # ------------------------------------------------------ scene meshes

    def build_elements(self, bsdf_offset: int = 0, emitter_index: int = -1):
        """Generate (meshes, bsdfs, templates).

        - one lens mesh + baffle per refracting surface (aperture gets a
          baffle only);
        - bsdf i is the dispersive interface ext=materials[i] (film side),
          int=materials[i+1] (lens.py:343,425);
        - ``templates``: list of (mesh_index, xy template, surface_index)
          enabling differentiable re-meshing.
        """
        meshes, bsdfs, templates = [], [], []
        black = SmoothDiffuse(reflectance=ConstantTexture(jnp.zeros(3)))
        bsdfs.append(black)
        black_idx = bsdf_offset

        for i, s in enumerate(self.surfaces):
            sag_np = lambda x, y, s=s: np.asarray(
                s.sag(jnp.asarray(x, jnp.float32),
                      jnp.asarray(y, jnp.float32)))
            V, F, Vb, Fb = create_surface_geometry(
                self.n_rings, self.n_sectors, s.radial_extent, sag_np,
                baffle_radius=self.baffle_scale * s.radial_extent,
                flip_normals=True,  # normals face the film (lens.py:783)
            )
            if i == self.aperture_index:
                meshes.append(Mesh.make(Vb, Fb, bsdf_index=black_idx,
                                        id=f"aperture{i}"))
                continue
            ext = self._mat(i)
            inte = self._mat(i + 1)
            bsdfs.append(DispersiveDielectric(
                int_ior_d=inte.ior, int_V_d=inte.V_d,
                ext_ior_d=ext.ior, ext_V_d=ext.V_d,
            ))
            b_idx = bsdf_offset + len(bsdfs) - 1
            mesh_idx = len(meshes)
            xy = jnp.asarray(V[:, :2])
            meshes.append(Mesh.make(
                V, F, normals=_sag_normals(s, xy),
                bsdf_index=b_idx, id=f"lens{i}"))
            meshes.append(Mesh.make(Vb, Fb, bsdf_index=black_idx,
                                    id=f"baffle{i}"))
            templates.append((mesh_idx, xy, i))
        return meshes, bsdfs, templates

    def remesh(self, meshes, templates, mesh_offset: int = 0):
        """Recompute lens vertex z from the CURRENT (differentiable)
        surface parameters (lens.py:509 update()).  Returns a new mesh
        list; baffles follow their surface rim z."""
        out = list(meshes)
        for mesh_idx, xy, si in templates:
            s = self.surfaces[si]
            z = s.sag(xy[:, 0], xy[:, 1])
            m = out[mesh_offset + mesh_idx]
            out[mesh_offset + mesh_idx] = m.replace(
                vertices=jnp.concatenate([xy, z[:, None]], axis=-1),
                normals=_sag_normals(s, xy),
            )
            # baffle sits right after the lens mesh; move its z to the rim
            bi = mesh_offset + mesh_idx + 1
            rim_z = s.sag(jnp.asarray(s.radial_extent), jnp.asarray(0.0))
            bm = out[bi]
            bv = bm.vertices
            out[bi] = bm.replace(
                vertices=jnp.concatenate(
                    [bv[:, :2], jnp.broadcast_to(rim_z, (bv.shape[0], 1))],
                    axis=-1,
                )
            )
        return out

    def update_bsdfs(self, bsdfs, bsdf_offset: int = 0):
        """Refresh the dispersive interface BSDFs from the current
        (differentiable) materials (lens.py LensElement.update)."""
        out = list(bsdfs)
        j = bsdf_offset + 1  # skip the black baffle bsdf
        for i in range(len(self.surfaces)):
            if i == self.aperture_index:
                continue
            ext = self._mat(i)
            inte = self._mat(i + 1)
            out[j] = DispersiveDielectric(
                int_ior_d=inte.ior, int_V_d=inte.V_d,
                ext_ior_d=ext.ior, ext_V_d=ext.V_d,
            )
            j += 1
        return out
