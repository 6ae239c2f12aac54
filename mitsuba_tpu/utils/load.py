"""Scene construction from Mitsuba-style dictionaries.

Reference: src/core/xml.cpp (1408 LoC — XML/dict loader building the object
DAG bottom-up via Properties + PluginManager) and the Python dict schema
accepted by mi.load_dict.  This loader accepts the same dictionary shapes
the reference's ``cornell_box()`` and test scenes use (util.py:565), mapped
onto the TPU plugin registries.  XML parsing is a thin layer on top (same
schema) and lives in ``load_file``.

Plugin coverage grows with the registries; unknown types raise with the
plugin name, mirroring PluginManager::create_object errors
(src/core/plugin.cpp:174).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import transform as tf
from ..models import shapes as shp
from ..models.bsdfs import (
    CONDUCTOR_IOR,
    SmoothConductor,
    SmoothDielectric,
    SmoothDiffuse,
    RoughConductor,
)
from ..models.emitters import (
    AreaEmitter,
    ConstantEmitter,
    DirectionalEmitter,
    PointEmitter,
)
from ..models.film import Film, ReconstructionFilter
from ..models.samplers import IndependentSampler, StratifiedSampler
from ..models.scene import make_scene
from ..models.sensors import PerspectiveCamera, ThinLensCamera
from ..models.integrators import (
    DepthIntegrator,
    DirectIntegrator,
    PathIntegrator,
    PRBIntegrator,
)
from ..models.textures import BitmapTexture, CheckerboardTexture, ConstantTexture

# named IORs (reference: src/render/ior.h table, subset)
IOR_NAMES = {
    "air": 1.000277, "water": 1.3330, "acrylic glass": 1.49,
    "bk7": 1.5046, "glass": 1.5046, "sodium chloride": 1.544,
    "amber": 1.55, "sapphire": 1.77, "diamond": 2.419, "vacuum": 1.0,
}

BSDF_TYPES = {"diffuse", "conductor", "roughconductor", "dielectric",
              "thindielectric", "roughdielectric", "plastic", "roughplastic",
              "twosided", "mask", "null", "blendbsdf", "principled",
              "normalmap", "bumpmap", "dispersive_dielectric", "dispersive",
              "principledthin", "pplastic", "hair", "measured",
              "measured_polarized", "polarizer", "retarder", "circular"}
SHAPE_TYPES = {"rectangle", "cube", "sphere", "disk", "cylinder", "obj",
               "ply", "mesh", "linearcurve", "bsplinecurve", "serialized",
               "blender"}
EMITTER_TYPES = {"area", "point", "constant", "directional", "envmap", "spot",
                 "directionalarea", "projector"}
SENSOR_TYPES = {"perspective", "thinlens", "orthographic", "radiancemeter",
                "irradiancemeter", "radialwarp", "realisticlens", "batch",
                "distant"}
INTEGRATOR_TYPES = {"path", "direct", "depth", "prb", "prb_basic", "aov",
                    "moment", "ptracer", "volpath", "prbvolpath",
                    "prb_projective", "direct_projective", "volpathmis",
                    "stokes"}


def _to_world(val):
    if val is None:
        return None
    return np.asarray(val, np.float32)


def _spectrum(val, default=None):
    """Parse a color/spectrum property -> (3,) array."""
    if val is None:
        return default
    if isinstance(val, dict):
        t = val["type"]
        if t in ("rgb", "srgb"):
            return jnp.asarray(np.broadcast_to(
                np.asarray(val["value"], np.float32), (3,)))
        if t in ("uniform", "spectrum"):
            return jnp.full((3,), float(val.get("value", 1.0)))
        if t == "d65":
            from ..models.spectra import D65Spectrum

            return D65Spectrum(
                scale=jnp.asarray(float(val.get("scale", 1.0)))).to_rgb()
        if t == "blackbody":
            from ..models.spectra import BlackbodySpectrum

            return BlackbodySpectrum(
                temperature=jnp.asarray(float(val.get(
                    "temperature", 6500.0)))).to_rgb()
        if t == "regular":
            from ..models.spectra import RegularSpectrum

            return RegularSpectrum(
                values=jnp.asarray(val["values"], jnp.float32),
                lambda_min=float(val.get("lambda_min", 380.0)),
                lambda_max=float(val.get("lambda_max", 780.0)),
            ).to_rgb()
        if t == "irregular":
            from ..models.spectra import IrregularSpectrum

            return IrregularSpectrum(
                wavelengths=jnp.asarray(val["wavelengths"], jnp.float32),
                values=jnp.asarray(val["values"], jnp.float32),
            ).to_rgb()
        raise ValueError(f"unsupported spectrum type {t!r}")
    if isinstance(val, (int, float)):
        return jnp.full((3,), float(val))
    return jnp.asarray(np.broadcast_to(np.asarray(val, np.float32), (3,)))


def _texture(val, default):
    """Parse a texture property -> texture plugin."""
    if val is None:
        return ConstantTexture(jnp.asarray(default, jnp.float32))
    if isinstance(val, dict) and val.get("type") not in ("rgb", "srgb",
                                                         "uniform"):
        t = val["type"]
        if t == "checkerboard":
            return CheckerboardTexture(
                color0=_spectrum(val.get("color0"), jnp.full((3,), 0.4)),
                color1=_spectrum(val.get("color1"), jnp.full((3,), 0.2)),
                scale=jnp.asarray(val.get("scale", [1.0, 1.0]), jnp.float32)
                if not np.isscalar(val.get("scale", 1.0))
                else jnp.full((2,), float(val.get("scale", 1.0))),
            )
        if t == "checkerlines":
            from ..models.textures import CheckerlinesTexture

            return CheckerlinesTexture(
                color0=_spectrum(val.get("color0"), jnp.zeros(3)),
                color1=_spectrum(val.get("color1"), jnp.ones(3)),
                scale=jnp.full((2,), float(val.get("scale", 8.0))),
                line_width=float(val.get("line_width", 0.05)),
            )
        if t == "polarlines":
            from ..models.textures import PolarLinesTexture

            return PolarLinesTexture(
                color0=_spectrum(val.get("color0"), jnp.zeros(3)),
                color1=_spectrum(val.get("color1"), jnp.ones(3)),
            )
        if t == "volume":
            from ..models.textures import Volume3DTexture

            if "filename" in val:
                from .volfile import read_vol

                data, mn, mx = read_vol(val["filename"])
                return Volume3DTexture(
                    data=jnp.asarray(data),
                    bbox_min=jnp.asarray(val.get("bbox_min", mn),
                                         jnp.float32),
                    bbox_max=jnp.asarray(val.get("bbox_max", mx),
                                         jnp.float32),
                )
            return Volume3DTexture(
                data=jnp.asarray(val["data"], jnp.float32),
                bbox_min=jnp.asarray(val.get("bbox_min", [-1, -1, -1]),
                                     jnp.float32),
                bbox_max=jnp.asarray(val.get("bbox_max", [1, 1, 1]),
                                     jnp.float32),
            )
        if t == "mesh_attribute":
            from ..models.textures import MeshAttributeTexture

            return MeshAttributeTexture(
                attr=jnp.asarray(val["attr"], jnp.float32),
                faces=jnp.asarray(val["faces"], jnp.int32),
            )
        if t == "comb2d":
            from ..models.textures import Comb2DTexture

            return Comb2DTexture(
                color0=_spectrum(val.get("color0"), jnp.zeros(3)),
                color1=_spectrum(val.get("color1"), jnp.ones(3)),
                scale=jnp.asarray(float(val.get("scale", 8.0))),
                line_width=float(val.get("line_width", 0.05)),
            )
        if t == "star":
            from ..models.textures import StarTexture

            return StarTexture(
                color0=_spectrum(val.get("color0"), jnp.zeros(3)),
                color1=_spectrum(val.get("color1"), jnp.ones(3)),
                n_spokes=int(val.get("n_spokes", 16)),
            )
        if t == "bitmap":
            if "data" in val:
                data = jnp.asarray(val["data"], jnp.float32)
            else:
                from .bitmap import read_image

                data = jnp.asarray(read_image(val["filename"]), jnp.float32)
            if val.get("mipmap", False):
                return BitmapTexture.with_mips(
                    data,
                    filter_nearest=val.get("filter_type") == "nearest")
            return BitmapTexture(
                data=data,
                filter_nearest=val.get("filter_type") == "nearest",
            )
        raise ValueError(f"unsupported texture type {t!r}")
    return ConstantTexture(_spectrum(val, jnp.asarray(default, jnp.float32)))


def _ior(val, default):
    if val is None:
        return float(default)
    if isinstance(val, str):
        return IOR_NAMES[val.lower()]
    return float(val)


def _make_bsdf(d):
    t = d["type"]
    if t == "diffuse":
        return SmoothDiffuse(reflectance=_texture(
            d.get("reflectance"), [0.5, 0.5, 0.5]))
    if t == "conductor":
        mat = d.get("material", "none")
        eta, k = CONDUCTOR_IOR.get(mat, CONDUCTOR_IOR["none"])
        if "eta" in d:
            eta = _spectrum(d["eta"])
        if "k" in d:
            k = _spectrum(d["k"])
        spec = d.get("specular_reflectance")
        return SmoothConductor(
            eta=eta, k=k,
            specular_reflectance=None if spec is None else _texture(spec, 1.0),
        )
    if t == "roughconductor":
        mat = d.get("material", "none")
        eta, k = CONDUCTOR_IOR.get(mat, CONDUCTOR_IOR["none"])
        if "eta" in d:
            eta = _spectrum(d["eta"])
        if "k" in d:
            k = _spectrum(d["k"])
        return RoughConductor(
            eta=eta, k=k,
            alpha=jnp.asarray(float(d.get("alpha", 0.1))),
        )
    if t == "dielectric":
        int_ior = _ior(d.get("int_ior"), 1.5046)
        ext_ior = _ior(d.get("ext_ior"), 1.000277)
        return SmoothDielectric(eta=jnp.asarray(int_ior / ext_ior))
    if t == "thindielectric":
        from ..models.bsdfs import ThinDielectric

        return ThinDielectric(eta=jnp.asarray(
            _ior(d.get("int_ior"), 1.5046) / _ior(d.get("ext_ior"), 1.000277)))
    if t == "roughdielectric":
        from ..models.bsdfs import RoughDielectric

        return RoughDielectric(
            eta=jnp.asarray(_ior(d.get("int_ior"), 1.5046)
                            / _ior(d.get("ext_ior"), 1.000277)),
            alpha=jnp.asarray(float(d.get("alpha", 0.1))),
        )
    if t == "plastic":
        from ..models.bsdfs import SmoothPlastic

        return SmoothPlastic(
            diffuse_reflectance=_texture(d.get("diffuse_reflectance"),
                                         [0.5, 0.5, 0.5]),
            eta=jnp.asarray(_ior(d.get("int_ior"), 1.49)
                            / _ior(d.get("ext_ior"), 1.000277)),
            nonlinear=bool(d.get("nonlinear", False)),
        )
    if t == "roughplastic":
        from ..models.bsdfs import RoughPlastic

        return RoughPlastic(
            diffuse_reflectance=_texture(d.get("diffuse_reflectance"),
                                         [0.5, 0.5, 0.5]),
            eta=jnp.asarray(_ior(d.get("int_ior"), 1.49)
                            / _ior(d.get("ext_ior"), 1.000277)),
            alpha=jnp.asarray(float(d.get("alpha", 0.1))),
            nonlinear=bool(d.get("nonlinear", False)),
        )
    if t == "null":
        from ..models.bsdfs import NullBSDF

        return NullBSDF()
    if t == "mask":
        from ..models.bsdfs import MaskBSDF

        return MaskBSDF(nested=_make_bsdf(d["bsdf"]),
                        opacity=_texture(d.get("opacity"), [0.5, 0.5, 0.5]))
    if t == "twosided":
        from ..models.bsdfs import TwoSided

        return TwoSided(nested=_make_bsdf(d["bsdf"]))
    if t == "blendbsdf":
        from ..models.bsdfs import BlendBSDF

        children = d.get("bsdfs")
        if children is None:
            children = [d["bsdf0"], d["bsdf1"]]
        return BlendBSDF(
            bsdf0=_make_bsdf(children[0]), bsdf1=_make_bsdf(children[1]),
            weight=_texture(d.get("weight"), [0.5, 0.5, 0.5]),
        )
    if t == "principled":
        from ..models.bsdfs import Principled

        return Principled(
            base_color=_texture(d.get("base_color"), [0.5, 0.5, 0.5]),
            metallic=jnp.asarray(float(d.get("metallic", 0.0))),
            roughness=jnp.asarray(float(d.get("roughness", 0.5))),
            specular=jnp.asarray(float(d.get("specular", 0.5))),
            anisotropic=jnp.asarray(float(d.get("anisotropic", 0.0))),
            clearcoat=jnp.asarray(float(d.get("clearcoat", 0.0))),
            clearcoat_gloss=jnp.asarray(
                float(d.get("clearcoat_gloss", 1.0))),
            sheen=jnp.asarray(float(d.get("sheen", 0.0))),
            sheen_tint=jnp.asarray(float(d.get("sheen_tint", 0.0))),
            spec_tint=jnp.asarray(float(d.get("spec_tint", 0.0))),
            spec_trans=jnp.asarray(float(d.get("spec_trans", 0.0))),
            eta=jnp.asarray(float(d.get("eta", 1.5))),
        )
    if t == "normalmap":
        from ..models.bsdfs import NormalMap

        return NormalMap(nested=_make_bsdf(d["bsdf"]),
                         normalmap=_texture(d.get("normalmap"),
                                            [0.5, 0.5, 1.0]))
    if t == "bumpmap":
        from ..models.bsdfs import BumpMap

        return BumpMap(nested=_make_bsdf(d["bsdf"]),
                       texture=_texture(d.get("texture"), [0.0, 0.0, 0.0]),
                       scale=float(d.get("scale", 1.0)))
    if t in ("dispersive_dielectric", "dispersive"):
        from ..models.bsdfs import DispersiveDielectric

        return DispersiveDielectric(
            int_ior_d=jnp.asarray(float(d.get("int_ior", 1.5046))),
            int_V_d=jnp.asarray(float(d.get("int_V_d", 64.17))),
            ext_ior_d=jnp.asarray(float(d.get("ext_ior", 1.000277))),
            ext_V_d=jnp.asarray(float(d.get("ext_V_d", 0.0))),
        )
    if t == "hair":
        from ..models.bsdfs import HairBSDF

        return HairBSDF(
            sigma_a=_spectrum(d.get("sigma_a"), jnp.full((3,), 0.06)),
            beta_m=jnp.asarray(float(d.get("beta_m", 0.3))),
            beta_n=jnp.asarray(float(d.get("beta_n", 0.3))),
            alpha=jnp.asarray(float(d.get("alpha", 2.0))),
            eta=jnp.asarray(_ior(d.get("int_ior"), 1.55)),
        )
    if t == "polarizer":
        from ..models.bsdfs import PolarizerBSDF

        return PolarizerBSDF(
            theta=_texture(d.get("theta"), [0.0] * 3),
            transmittance=_texture(d.get("transmittance"), [1.0] * 3),
        )
    if t == "retarder":
        from ..models.bsdfs import RetarderBSDF

        return RetarderBSDF(
            theta=_texture(d.get("theta"), [0.0] * 3),
            delta=_texture(d.get("delta"), [90.0] * 3),
            transmittance=_texture(d.get("transmittance"), [1.0] * 3),
        )
    if t == "circular":
        from ..models.bsdfs import CircularPolarizerBSDF

        return CircularPolarizerBSDF(
            transmittance=_texture(d.get("transmittance"), [1.0] * 3),
            left_handed=bool(d.get("left_handed", False)),
        )
    if t == "measured_polarized":
        from ..models.bsdfs import make_measured_polarized

        return make_measured_polarized(
            d["filename"],
            alpha_sample=float(d.get("alpha_sample", 0.1)),
            wavelength=float(d.get("wavelength", -1.0)))
    if t == "measured":
        if "filename" in d:
            # Dupuy-Jakob '.bsdf' container with NDF-warp sampling
            from ..models.bsdfs import measured_rgl_from_file

            return measured_rgl_from_file(d["filename"])
        from ..models.bsdfs import MeasuredBSDF

        return MeasuredBSDF(data=jnp.asarray(d["data"], jnp.float32))
    if t == "principledthin":
        from ..models.bsdfs import PrincipledThin

        return PrincipledThin(
            base_color=_texture(d.get("base_color"), [0.5, 0.5, 0.5]),
            roughness=jnp.asarray(float(d.get("roughness", 0.5))),
            spec_trans=jnp.asarray(float(d.get("spec_trans", 0.0))),
            diff_trans=jnp.asarray(float(d.get("diff_trans", 0.0))),
            eta=jnp.asarray(float(d.get("eta", 1.5))),
        )
    if t == "pplastic":
        from ..models.bsdfs import PPlastic

        return PPlastic(
            diffuse_reflectance=_texture(d.get("diffuse_reflectance"),
                                         [0.5, 0.5, 0.5]),
            alpha=jnp.asarray(float(d.get("alpha", 0.1))),
            eta=jnp.asarray(_ior(d.get("int_ior"), 1.49)
                            / _ior(d.get("ext_ior"), 1.000277)),
        )
    raise ValueError(f"unsupported bsdf plugin {t!r}")


def _make_analytic_prim(d, bsdf_index, emitter_index):
    """Analytic-prim descriptor for models/analytic.build_analytic
    (``{'analytic': True}`` sphere/disk/cylinder dicts — the reference's
    default exact shapes, sphere.cpp/disk.cpp/cylinder.cpp)."""
    t = d["type"]
    w = _to_world(d.get("to_world"))
    flip = bool(d.get("flip_normals", False))
    sid = d.get("id", t)
    if t == "sphere":
        if w is not None:
            m = np.asarray(w, np.float32)
            c = m[:3, 3]
            r = float(np.linalg.norm(m[:3, 0]))  # uniform scale only
        else:
            c = np.asarray(d.get("center", [0, 0, 0]), np.float32)
            r = float(d.get("radius", 1.0))
        return ("sphere", c, r, bsdf_index, emitter_index, flip, sid)
    if t == "disk":
        if w is not None:
            m = np.asarray(w, np.float32)
            c, su, sv = m[:3, 3], m[:3, 0], m[:3, 1]
        else:
            c = np.asarray(d.get("center", [0, 0, 0]), np.float32)
            su = np.asarray([1, 0, 0], np.float32) \
                * float(d.get("radius", 1.0))
            sv = np.asarray([0, 1, 0], np.float32) \
                * float(d.get("radius", 1.0))
        n = np.cross(su, sv)
        n = n / max(float(np.linalg.norm(n)), 1e-20)
        return ("disk", c, su, sv, n, bsdf_index, emitter_index, flip, sid)
    if t == "cylinder":
        p0 = np.asarray(d.get("p0", [0, 0, 0]), np.float32)
        p1 = np.asarray(d.get("p1", [0, 0, 1]), np.float32)
        r = float(d.get("radius", 1.0))
        if w is not None:
            m = np.asarray(w, np.float32)
            p0 = m[:3, :3] @ p0 + m[:3, 3]
            p1 = m[:3, :3] @ p1 + m[:3, 3]
            r *= float(np.linalg.norm(m[:3, 0]))
        axis = p1 - p0
        length = max(float(np.linalg.norm(axis)), 1e-20)
        return ("cylinder", p0, axis / length, length, r,
                bsdf_index, emitter_index, flip, sid)
    if t == "linearcurve":
        # analytic swept-sphere segments (exact tube cross-section —
        # models/analytic.py curve prims, linearcurve.cpp)
        cp = np.asarray(d["control_points"], np.float32)
        rr = np.broadcast_to(
            np.asarray(d.get("radius", 0.05), np.float32),
            (cp.shape[0],)).astype(np.float32)
        if w is not None:
            m = np.asarray(w, np.float32)
            cp = cp @ m[:3, :3].T + m[:3, 3]
            rr = rr * float(np.linalg.norm(m[:3, 0]))
        n_seg = cp.shape[0] - 1
        us = np.linspace(0.0, 1.0, n_seg + 1, dtype=np.float32)
        return [
            ("curve", cp[i], cp[i + 1], float(rr[i]), float(rr[i + 1]),
             float(us[i]), float(us[i + 1]),
             bsdf_index, emitter_index, flip, sid)
            for i in range(n_seg)
        ]
    if t == "bsplinecurve":
        # EXACT cubic swept-sphere prims (round 4; bsplinecurve.cpp's
        # per-ray iterative solve): each parent uniform-cubic segment
        # contributes ``subdiv`` subsegment prims whose flattened tube
        # (inflated by the measured flattening bound) only SEEDS the
        # in-kernel Newton solve on the true canal surface
        cp = np.asarray(d["control_points"], np.float32)
        rr = np.broadcast_to(
            np.asarray(d.get("radius", 0.05), np.float32),
            (cp.shape[0],)).astype(np.float32)
        if w is not None:
            m = np.asarray(w, np.float32)
            cp = cp @ m[:3, :3].T + m[:3, 3]
            rr = rr * float(np.linalg.norm(m[:3, 0]))
        # clamped endpoints (shapes.bspline_centerline convention)
        cp = np.concatenate([cp[:1], cp, cp[-1:]])
        rr = np.concatenate([rr[:1], rr, rr[-1:]])
        subdiv = int(d.get("subdiv", 4))
        n_par = cp.shape[0] - 3

        def beval(P, R, s):
            s = np.asarray(s, np.float32)
            w4 = np.stack([(1 - s) ** 3 / 6.0,
                           (3 * s ** 3 - 6 * s ** 2 + 4) / 6.0,
                           (-3 * s ** 3 + 3 * s ** 2 + 3 * s + 1) / 6.0,
                           s ** 3 / 6.0], axis=-1)
            return w4 @ P, w4 @ R

        out = []
        total = n_par * subdiv
        for i in range(n_par):
            P = cp[i:i + 4]
            R = rr[i:i + 4]
            ws = np.linspace(0.0, 1.0, subdiv + 1, dtype=np.float32)
            pts, rads = beval(P, R, ws)
            # flattening bound: max deviation of the cubic from the
            # chord/lerp tube over a dense probe (inflates candidates)
            sd = np.linspace(0.0, 1.0, 16 * subdiv + 1,
                             dtype=np.float32)
            cpts, crad = beval(P, R, sd)
            wi = np.clip((sd * subdiv).astype(np.int32), 0, subdiv - 1)
            fr = sd * subdiv - wi
            lerp_p = (pts[wi] * (1 - fr)[:, None]
                      + pts[wi + 1] * fr[:, None])
            lerp_r = rads[wi] * (1 - fr) + rads[wi + 1] * fr
            pad = float(np.max(
                np.linalg.norm(cpts - lerp_p, axis=1)
                + np.abs(crad - lerp_r))) * 1.25 + 1e-5
            for q in range(subdiv):
                k = i * subdiv + q
                out.append((
                    "cubiccurve", pts[q], pts[q + 1],
                    float(rads[q]), float(rads[q + 1]),
                    k / total, (k + 1) / total,
                    P, R, float(ws[q]), float(ws[q + 1]), pad,
                    bsdf_index, emitter_index, flip, sid))
        return out
    raise ValueError(f"shape {t!r} has no analytic form")


def _make_shape_mesh(d, bsdf_index, emitter_index):
    t = d["type"]
    w = _to_world(d.get("to_world"))
    if t == "rectangle":
        geo = shp.rectangle(w)
    elif t == "cube":
        geo = shp.cube(w)
    elif t == "disk":
        geo = shp.disk_mesh(to_world=w)
    elif t == "cylinder":
        geo = shp.cylinder_mesh(
            n_seg=int(d.get("n_seg", 32)),
            p0=d.get("p0", [0, 0, 0]), p1=d.get("p1", [0, 0, 1]),
            radius=float(d.get("radius", 1.0)), to_world=w,
            capped=bool(d.get("capped", False)),
        )
    elif t == "sphere":
        if w is None and ("center" in d or "radius" in d):
            c = np.asarray(d.get("center", [0, 0, 0]), np.float32)
            r = float(d.get("radius", 1.0))
            w = np.asarray(tf.compose(tf.translate(c), tf.scale(r)), np.float32)
        geo = shp.sphere_mesh(int(d.get("subdiv", 4)), w)
    elif t == "serialized":
        from .mesh_io import load_serialized

        v, f, n, uv = load_serialized(d["filename"],
                                      int(d.get("shape_index", 0)))
        if w is not None:
            v, f, n, uv = shp._apply_to_world(
                v, f, n if n is not None else np.zeros_like(v),
                uv if uv is not None else np.zeros((v.shape[0], 2),
                                                   np.float32), w)
        geo = (v, f, n, uv)
    elif t in ("obj", "ply"):
        from .mesh_io import load_mesh_file

        v, f, n, uv = load_mesh_file(d["filename"])
        if w is not None:
            v, f, n, uv = shp._apply_to_world(v, f, n if n is not None else
                                              np.zeros_like(v), uv, w)
            if d.get("face_normals", False):
                n = None
        geo = (v, f, n, uv)
    elif t == "linearcurve":
        geo = shp.linear_curve_mesh(
            np.asarray(d["control_points"], np.float32),
            np.asarray(d.get("radius", 0.05), np.float32),
            n_seg=int(d.get("n_seg", 8)), to_world=w,
        )
    elif t == "bsplinecurve":
        geo = shp.bspline_curve_mesh(
            np.asarray(d["control_points"], np.float32),
            np.asarray(d.get("radius", 0.05), np.float32),
            n_seg=int(d.get("n_seg", 8)),
            subdiv=int(d.get("subdiv", 4)), to_world=w,
        )
    elif t == "mesh":
        geo = (np.asarray(d["vertices"], np.float32),
               np.asarray(d["faces"], np.int32),
               d.get("normals"), d.get("uvs"))
    elif t == "blender":
        # in-memory Blender mesh buffers from the exporter add-on
        # (src/shapes/blender.cpp:60; the to_world transform is applied
        # inside the decoder like the reference's m_to_world)
        from .blender_mesh import load_blender_mesh

        bd = dict(d)
        if w is not None:
            bd["to_world"] = w
        v, f, n, uv, _cols = load_blender_mesh(bd)
        geo = (v, f, n, uv)
    else:
        raise ValueError(f"unsupported shape plugin {t!r}")
    v, f, n, uv = geo
    if d.get("face_normals", False):
        n = None
    return shp.Mesh.make(v, f, normals=n, uvs=uv,
                         bsdf_index=bsdf_index, emitter_index=emitter_index,
                         id=d.get("id", t))


def _make_film(d):
    d = d or {}
    rf = (d.get("rfilter") or {}).get("type", "gaussian")
    rfilter = {
        "gaussian": ReconstructionFilter.gaussian(),
        "box": ReconstructionFilter.box(),
        "tent": ReconstructionFilter.tent(),
        "mitchell": ReconstructionFilter.mitchell(),
        "catmullrom": ReconstructionFilter.catmullrom(),
        "lanczos": ReconstructionFilter.lanczos(),
    }[rf]
    if d.get("type") == "specfilm":
        from ..models.film import SpectralFilm

        return SpectralFilm(
            width=int(d.get("width", 256)), height=int(d.get("height", 256)),
            n_bins=int(d.get("n_bins", 16)),
            lambda_min=float(d.get("lambda_min", 380.0)),
            lambda_max=float(d.get("lambda_max", 780.0)),
            rfilter=rfilter,
        )
    return Film(width=int(d.get("width", 256)), height=int(d.get("height", 256)),
                rfilter=rfilter)


def _make_sampler(d):
    d = d or {}
    t = d.get("type", "independent")
    n = int(d.get("sample_count", 16))
    if t == "independent":
        return IndependentSampler(sample_count=n)
    if t == "stratified":
        return StratifiedSampler(sample_count=n)
    if t == "multijitter":
        from ..models.samplers import MultijitterSampler

        return MultijitterSampler(sample_count=n)
    if t == "ldsampler":
        from ..models.samplers import LDSampler

        return LDSampler(sample_count=n)
    if t == "orthogonal":
        from ..models.samplers import OrthogonalSampler

        return OrthogonalSampler(sample_count=n)
    raise ValueError(f"unsupported sampler plugin {t!r}")


def _make_sensor(d):
    t = d["type"]
    film = _make_film(d.get("film"))
    sampler = _make_sampler(d.get("sampler"))
    w = d.get("to_world")
    to_world = jnp.asarray(
        np.asarray(w, np.float32) if w is not None else np.eye(4, dtype=np.float32)
    )
    common = dict(
        to_world=to_world, film=film, sampler=sampler,
        fov=float(d.get("fov", 39.3077)),
        fov_axis=d.get("fov_axis", "x"),
        near_clip=float(d.get("near_clip", 1e-2)),
        far_clip=float(d.get("far_clip", 1e4)),
    )
    if t == "perspective":
        anim = None
        if "animation" in d:
            from ..core.transform import AnimatedTransform

            a = d["animation"]
            anim = AnimatedTransform.create(
                a["times"], [np.asarray(m, np.float32)
                             for m in a["matrices"]])
        sh_open = float(d.get("shutter_open", 0.0))
        if "shutter_open_time" in d:
            sh_time = float(d["shutter_open_time"])
        elif "shutter_close" in d:
            sh_time = float(d["shutter_close"]) - sh_open
        else:
            sh_time = 0.0
        from .config import is_spectral

        return PerspectiveCamera(
            spectral=bool(d.get("spectral", is_spectral())),
            animation=anim, shutter_open=sh_open,
            shutter_open_time=sh_time, **common)
    if t == "thinlens":
        return ThinLensCamera(
            aperture_radius=jnp.asarray(float(d.get("aperture_radius", 0.1))),
            focus_distance=jnp.asarray(float(d.get("focus_distance", 1.0))),
            **common,
        )
    if t == "realisticlens":
        from ..lens.camera import make_realistic_lens_camera

        return make_realistic_lens_camera(d, film, sampler)
    if t == "orthographic":
        from ..models.sensors import OrthographicCamera

        return OrthographicCamera(
            to_world=to_world, film=film, sampler=sampler,
            scale_x=jnp.asarray(float(d.get("scale_x", 1.0))),
            scale_y=jnp.asarray(float(d.get("scale_y", 1.0))),
            near_clip=float(d.get("near_clip", 1e-2)),
            far_clip=float(d.get("far_clip", 1e4)),
        )
    if t == "radiancemeter":
        from ..models.sensors import RadianceMeter

        return RadianceMeter(to_world=to_world, film=film, sampler=sampler)
    if t == "irradiancemeter":
        from ..models.sensors import IrradianceMeter

        return IrradianceMeter(
            to_world=to_world, film=film, sampler=sampler,
            radius=jnp.asarray(float(d.get("radius", 1.0))),
        )
    if t == "radialwarp":
        from ..models.sensors import RadialWarpCamera

        return RadialWarpCamera(
            to_world=to_world, film=film, sampler=sampler,
            k_warp=jnp.asarray(float(d.get("k_warp", 1.0))),
            fov=float(d.get("fov", 39.3077)),
            fov_axis=d.get("fov_axis", "x"),
            near_clip=float(d.get("near_clip", 1e-2)),
            far_clip=float(d.get("far_clip", 1e4)),
        )
    if t == "batch":
        from ..models.sensors import BatchSensor

        children = [_make_sensor(c) for c in d["sensors"]]
        return BatchSensor(sensors=tuple(children), film=film,
                           sampler=sampler)
    if t == "distant":
        from ..models.sensors import DistantSensor

        return DistantSensor(
            direction=jnp.asarray(d.get("direction", [0, 0, -1]),
                                  jnp.float32),
            film=film, sampler=sampler,
        )
    raise ValueError(f"unsupported sensor plugin {t!r}")


def _depth(d, default=6, key="max_depth"):
    """integrator.h: max_depth == -1 means unlimited (RR-bounded);
    XLA needs a static bound, so it maps to a deep cap."""
    v = int(d.get(key, default))
    return 64 if v < 0 else v


def _make_integrator(d):
    t = d["type"]
    if "max_depth" in d:
        d = dict(d)
        d["max_depth"] = _depth(d)
    if t == "path":
        return PathIntegrator(max_depth=int(d.get("max_depth", 6)),
                              rr_depth=int(d.get("rr_depth", 5)),
                              hide_emitters=bool(d.get("hide_emitters",
                                                       False)),
                              ray_diffs=bool(d.get("ray_diffs", False)),
                              timeout=float(d.get("timeout", 0.0)))
    if t == "direct":
        return DirectIntegrator(
            emitter_samples=int(d.get("emitter_samples",
                                      d.get("shading_samples", 1))),
            bsdf_samples=int(d.get("bsdf_samples",
                                   d.get("shading_samples", 1))),
        )
    if t == "depth":
        return DepthIntegrator()
    if t == "prb":
        return PRBIntegrator(max_depth=int(d.get("max_depth", 6)),
                             rr_depth=int(d.get("rr_depth", 5)))
    if t == "prb_basic":
        from ..models.integrators import PRBBasicIntegrator

        return PRBBasicIntegrator(
            max_depth=int(d.get("max_depth", 6)),
            hide_emitters=bool(d.get("hide_emitters", False)),
        )
    if t == "ptracer":
        from ..models.integrators import ParticleTracerIntegrator

        from .config import is_spectral

        return ParticleTracerIntegrator(
            max_depth=int(d.get("max_depth", 8)),
            rr_depth=int(d.get("rr_depth", 5)),
            hide_emitters=bool(d.get("hide_emitters", False)),
            spectral=bool(d.get("spectral", is_spectral())),
        )
    if t == "stokes":
        from ..models.integrators.stokes import StokesIntegrator

        # the reference wraps a nested integrator (stokes.cpp:62); the
        # TPU version is its own polarized path tracer, so only depth
        # options of the nested dict are honored
        nested = d.get("integrator", {})
        return StokesIntegrator(
            max_depth=int(d.get("max_depth",
                                nested.get("max_depth", 6))),
            rr_depth=int(d.get("rr_depth", nested.get("rr_depth", 5))),
            hide_emitters=bool(d.get("hide_emitters", False)),
        )
    if t == "aov":
        from ..models.integrators.aov import AOVIntegrator

        names = d.get("aovs", "depth:depth,nn:sh_normals")
        if isinstance(names, str):
            parsed = tuple(x.split(":")[-1].strip()
                           for x in names.split(",") if x.strip())
        else:
            parsed = tuple(names)
        nested_d = d.get("integrator")
        nested = _make_integrator(nested_d) if nested_d else None
        return AOVIntegrator(aovs=parsed, nested=nested)
    if t == "volpathmis":
        # product-form spectral MIS (volpathmis.cpp:596) for homogeneous
        # media; grid media keep volpath's per-event channel weighting
        from ..models.integrators import VolPathIntegrator
        from ..models.integrators.volpathmis import VolPathMISIntegrator

        return VolPathMISIntegrator(
            max_depth=int(d.get("max_depth", 8)),
            rr_depth=int(d.get("rr_depth", 6)),
            hide_emitters=bool(d.get("hide_emitters", False)),
        )
    if t == "volpath":
        from ..models.integrators import VolPathIntegrator

        return VolPathIntegrator(
            max_depth=int(d.get("max_depth", 8)),
            rr_depth=int(d.get("rr_depth", 6)),
            hide_emitters=bool(d.get("hide_emitters", False)),
        )
    if t == "prb_projective":
        from ..models.integrators import PathProjectiveIntegrator

        return PathProjectiveIntegrator(
            max_depth=int(d.get("max_depth", 6)),
            rr_depth=int(d.get("rr_depth", 5)),
            sppp=int(d.get("sppp", 4096)),
            guiding=d.get("guiding", "grid"),
        )
    if t == "direct_projective":
        from ..models.integrators import DirectProjectiveIntegrator

        return DirectProjectiveIntegrator(
            sppp=int(d.get("sppp", 4096)),
            guiding=d.get("guiding", "grid"),
        )
    if t == "prbvolpath":
        from ..models.integrators import PRBVolPathIntegrator

        return PRBVolPathIntegrator(
            max_depth=int(d.get("max_depth", 8)),
            rr_depth=int(d.get("rr_depth", 6)),
            hide_emitters=bool(d.get("hide_emitters", False)),
        )
    if t == "moment":
        from ..models.integrators.aov import MomentIntegrator

        return MomentIntegrator(
            nested=_make_integrator(d.get("integrator",
                                          {"type": "path"})))
    raise ValueError(f"unsupported integrator plugin {t!r}")


def load_dict(scene_dict: dict, use_bvh=None):
    """Build a Scene from a Mitsuba-style dict (mi.load_dict analogue).

    Supports: named BSDFs + {'type':'ref','id':...}, shapes with inline
    bsdf/emitter, standalone emitters, one sensor with film/sampler, one
    integrator.
    """
    assert scene_dict.get("type", "scene") == "scene"
    named_bsdfs: dict[str, int] = {}
    bsdfs = []
    emitters = []
    meshes = []
    sensor = None
    integrator = None
    medium = None
    sdf = None
    analytic_prims = []
    shapegroups = {}
    instance_uses = {}

    def bsdf_index_of(b):
        """Resolve an inline bsdf dict or a ref to an index in bsdfs."""
        if b is None:
            if "__default__" not in named_bsdfs:
                named_bsdfs["__default__"] = len(bsdfs)
                bsdfs.append(SmoothDiffuse(
                    reflectance=ConstantTexture(jnp.full((3,), 0.5))))
            return named_bsdfs["__default__"]
        if b.get("type") == "ref":
            return named_bsdfs[b["id"]]
        bsdfs.append(_make_bsdf(b))
        return len(bsdfs) - 1

    # pass 1: named BSDFs (must precede refs, like the reference's
    # bottom-up instantiation)
    for key, val in scene_dict.items():
        if isinstance(val, dict) and val.get("type") in BSDF_TYPES:
            named_bsdfs[key] = len(bsdfs)
            bsdfs.append(_make_bsdf(val))

    # pass 2: everything else
    for key, val in scene_dict.items():
        if not isinstance(val, dict) or "type" not in val:
            continue
        t = val["type"]
        if t in BSDF_TYPES:
            continue
        if t in SHAPE_TYPES:
            em_idx = -1
            if "emitter" in val:
                e = val["emitter"]
                em_idx = len(emitters)
                if e["type"] == "area":
                    emitters.append(AreaEmitter(
                        radiance=_texture(e.get("radiance"), [1.0, 1.0, 1.0])
                    ))
                elif e["type"] == "directionalarea":
                    from ..models.emitters import DirectionalAreaEmitter

                    emitters.append(DirectionalAreaEmitter(
                        radiance=_texture(e.get("radiance"), [1.0, 1.0, 1.0])
                    ))
                else:
                    raise ValueError(
                        f"unsupported shape emitter {e['type']!r}")
                if "sampling_weight" in e:
                    emitters[-1] = emitters[-1].replace(
                        sampling_weight=float(e["sampling_weight"]))
            b_idx = bsdf_index_of(val.get("bsdf"))
            if isinstance(val.get("interior"), dict):
                # per-shape interior medium; the TPU scene carries one
                # global medium (volpath's uniform-lane design), so the
                # first interior becomes scene_medium
                if medium is None:
                    medium = _make_medium(val["interior"])
            val = dict(val, id=val.get("id", key))
            if val.get("analytic", False):
                p = _make_analytic_prim(val, b_idx, em_idx)
                # curve shapes expand to one prim per segment
                analytic_prims.extend(p if isinstance(p, list) else [p])
            else:
                meshes.append(_make_shape_mesh(val, b_idx, em_idx))
        elif t in EMITTER_TYPES:
            zeros = jnp.zeros(3)
            one = jnp.asarray(1.0)
            if t == "point":
                emitters.append(PointEmitter(
                    intensity=_spectrum(val.get("intensity"), jnp.ones(3)),
                    position=jnp.asarray(val.get("position", [0, 0, 0]),
                                         jnp.float32),
                ))
            elif t == "constant":
                emitters.append(ConstantEmitter(
                    radiance=_spectrum(val.get("radiance"), jnp.ones(3)),
                    scene_center=zeros, scene_radius=one,
                ))
            elif t == "directional":
                emitters.append(DirectionalEmitter(
                    irradiance=_spectrum(val.get("irradiance"), jnp.ones(3)),
                    direction=jnp.asarray(val["direction"], jnp.float32),
                    scene_center=zeros, scene_radius=one,
                ))
            elif t == "envmap":
                from ..models.emitters import EnvmapEmitter

                if "data" in val:
                    data = np.asarray(val["data"], np.float32)
                else:
                    from .bitmap import read_image

                    data = read_image(val["filename"])
                emitters.append(EnvmapEmitter.create(
                    data, scale=float(val.get("scale", 1.0)),
                    to_world=_to_world(val.get("to_world")),
                ))
            elif t == "spot":
                from ..models.emitters import SpotEmitter

                if "to_world" in val:
                    m = np.asarray(val["to_world"], np.float32)
                    pos = m[:3, 3]
                    direc = m[:3, 2]
                else:
                    pos = np.asarray(val.get("position", [0, 0, 0]), np.float32)
                    direc = np.asarray(val.get("direction", [0, 0, 1]),
                                       np.float32)
                emitters.append(SpotEmitter(
                    intensity=_spectrum(val.get("intensity"), jnp.ones(3)),
                    position=jnp.asarray(pos),
                    direction=jnp.asarray(direc),
                    cutoff_angle=float(val.get("cutoff_angle", 20.0)),
                    beam_width=float(val.get(
                        "beam_width", 0.75 * float(val.get("cutoff_angle", 20.0)))),
                ))
            elif t == "projector":
                from ..models.emitters import ProjectorEmitter

                if "to_world" in val:
                    m = np.asarray(val["to_world"], np.float32)
                    pos = m[:3, 3]
                    direc = m[:3, 2]
                    up = m[:3, 1]
                else:
                    pos = np.asarray(val.get("position", [0, 0, 0]),
                                     np.float32)
                    direc = np.asarray(val.get("direction", [0, 0, 1]),
                                       np.float32)
                    up = np.asarray(val.get("up", [0, 1, 0]), np.float32)
                emitters.append(ProjectorEmitter(
                    irradiance=_texture(val.get("irradiance"), [1.0, 1.0, 1.0]),
                    position=jnp.asarray(pos),
                    direction=jnp.asarray(direc),
                    up=jnp.asarray(up),
                    scale=jnp.asarray(float(val.get("scale", 1.0))),
                    fov=float(val.get("fov", 45.0)),
                ))
            else:
                raise ValueError(f"unsupported emitter plugin {t!r}")
            if "sampling_weight" in val:
                emitters[-1] = emitters[-1].replace(
                    sampling_weight=float(val["sampling_weight"]))
        elif t == "merge":
            # merge.cpp: fuse child shapes that share a material into
            # one mesh (fewer dispatch groups / smaller static scene)
            groups = {}
            for ck, cv in val.items():
                if not isinstance(cv, dict) or ck in ("type", "id"):
                    continue
                if cv.get("type") not in SHAPE_TYPES:
                    continue
                b_idx = bsdf_index_of(cv.get("bsdf"))
                m = _make_shape_mesh(dict(cv, id=cv.get("id", ck)),
                                     b_idx, -1)
                groups.setdefault(b_idx, []).append(m)
            for b_idx, ms in groups.items():
                if len(ms) == 1:
                    meshes.append(ms[0])
                    continue
                has_n = all(m.normals is not None for m in ms)
                has_uv = all(m.uvs is not None for m in ms)
                offs = np.cumsum(
                    [0] + [int(m.vertices.shape[0]) for m in ms])
                meshes.append(type(ms[0])(
                    vertices=jnp.concatenate(
                        [m.vertices for m in ms]),
                    faces=jnp.concatenate(
                        [m.faces + offs[i] for i, m in enumerate(ms)]),
                    normals=(jnp.concatenate(
                        [m.normals for m in ms]) if has_n else None),
                    uvs=(jnp.concatenate([m.uvs for m in ms])
                         if has_uv else None),
                    bsdf_index=b_idx,
                    emitter_index=-1,
                    id=val.get("id", key) + f"_merged{b_idx}",
                ))
        elif t == "shapegroup":
            group = []
            for ck, cv in val.items():
                if not isinstance(cv, dict) or ck in ("type", "id"):
                    continue
                b_idx = bsdf_index_of(cv.get("bsdf"))
                group.append(_make_shape_mesh(
                    dict(cv, id=cv.get("id", ck)), b_idx, -1))
            shapegroups[val.get("id", key)] = group
        elif t == "instance":
            # true instancing (round 4, models/instancing.py): record
            # (group id, to_world) — the group geometry + BLAS are
            # shared across all its instances instead of being
            # flattened into copies (ref instance.cpp / per-group
            # Embree scenes, scene_embree.inl:113-160)
            ref = val.get("shapegroup")
            gid = ref["id"] if isinstance(ref, dict) else ref
            w_i = _to_world(val.get("to_world"))
            instance_uses.setdefault(gid, []).append(np.asarray(w_i))
        elif t == "sdfgrid":
            from ..models.sdf import SDFGrid

            sdf = SDFGrid(
                values=jnp.asarray(val["data"], jnp.float32),
                bbox_min=jnp.asarray(val.get("bbox_min", [-1, -1, -1]),
                                     jnp.float32),
                bbox_max=jnp.asarray(val.get("bbox_max", [1, 1, 1]),
                                     jnp.float32),
                bsdf_index=bsdf_index_of(val.get("bsdf")),
            )
        elif t in ("homogeneous", "heterogeneous"):
            medium = _make_medium(val)
        elif t in SENSOR_TYPES:
            sensor = _make_sensor(val)
        elif t in INTEGRATOR_TYPES:
            integrator = _make_integrator(val)
        else:
            raise ValueError(f"unknown plugin type {t!r} (key {key!r})")

    if sensor is None:
        sensor = PerspectiveCamera(to_world=jnp.eye(4))
    analytic = None
    if analytic_prims:
        from ..models.analytic import build_analytic

        analytic = build_analytic(analytic_prims)
    instances = None
    if instance_uses:
        from ..models.instancing import InstancedGroup

        instances = [
            InstancedGroup.create(shapegroups[gid], mats, id=gid)
            for gid, mats in instance_uses.items()
        ]
    return make_scene(meshes, bsdfs, emitters, sensor, use_bvh=use_bvh,
                      integrator=integrator, medium=medium, sdf=sdf,
                      analytic=analytic, instances=instances)


def _make_phase(d):
    from ..models.media import HGPhase, IsotropicPhase

    d = d or {}
    t = d.get("type", "isotropic")
    if t == "isotropic":
        return IsotropicPhase()
    if t == "hg":
        return HGPhase(g=jnp.asarray(float(d.get("g", 0.0))))
    if t == "rayleigh":
        from ..models.media import RayleighPhase

        return RayleighPhase()
    if t == "blendphase":
        from ..models.media import BlendPhase

        return BlendPhase(
            phase1=_make_phase(d.get("phase1", d.get("phase_0"))),
            phase2=_make_phase(d.get("phase2", d.get("phase_1"))),
            weight=jnp.asarray(float(d.get("weight", 0.5))),
        )
    if t == "tabphase":
        from ..models.media import TabulatedPhase

        return TabulatedPhase(
            values=jnp.asarray(d["values"], jnp.float32))
    if t == "sggx":
        from ..models.media import SGGXPhase

        # specular microflakes (sggx.cpp default); S = the six
        # [S_xx, S_yy, S_zz, S_xy, S_xz, S_yz] matrix entries
        return SGGXPhase(S=jnp.asarray(d["S"], jnp.float32))
    raise ValueError(f"unsupported phase plugin {t!r}")


def _make_medium(d):
    from ..models.media import GridMedium, HomogeneousMedium

    t = d["type"]
    phase = _make_phase(d.get("phase"))
    if t == "homogeneous":
        return HomogeneousMedium(
            sigma_t=_spectrum(d.get("sigma_t"), jnp.ones(3)),
            albedo=_spectrum(d.get("albedo"), jnp.full((3,), 0.75)),
            phase=phase,
        )
    if t == "heterogeneous":
        # heterogeneous.cpp takes the extinction field as `sigma_t`
        # (a volume); our dicts also accept it under `density`
        density = d.get("density")
        sig_spec, sig_default = d.get("sigma_t"), jnp.ones(3)
        if density is None and isinstance(sig_spec, (dict, str)):
            density, sig_spec = sig_spec, None
        if density is None:
            raise ValueError(
                "heterogeneous medium needs `density` or a gridvolume "
                "`sigma_t`")
        bbox_default = ([-1, -1, -1], [1, 1, 1])
        # `.vol` gridvolume container (volumegrid.cpp:128), either as a
        # nested {"type": "gridvolume", "filename": ...} or a direct path
        if isinstance(density, dict):
            density = density.get("filename", density.get("data"))
        if isinstance(density, str):
            from .volfile import read_vol

            density, mn, mx = read_vol(density)
            if density.shape[-1] == 1:
                density = density[..., 0]
            bbox_default = (mn, mx)
        return GridMedium(
            density=jnp.asarray(density, jnp.float32),
            sigma_t=_spectrum(sig_spec, sig_default),
            albedo=_spectrum(d.get("albedo"), jnp.full((3,), 0.75)),
            bbox_min=jnp.asarray(d.get("bbox_min", bbox_default[0]),
                                 jnp.float32),
            bbox_max=jnp.asarray(d.get("bbox_max", bbox_default[1]),
                                 jnp.float32),
            scale=jnp.asarray(float(d.get("scale", 1.0))),
            phase=phase,
        )
    raise ValueError(f"unsupported medium plugin {t!r}")
