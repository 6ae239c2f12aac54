"""Breadth coverage: envmap importance sampling, spot light, AOV/moment
integrators, samplers, rfilters, misc sensors (incl. the [FORK]
radialwarp camera)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu import load_dict, render
from mitsuba_tpu.core import rng
from mitsuba_tpu.core.distr2d import Marginal2D
from mitsuba_tpu.models.emitters import EnvmapEmitter, SpotEmitter
from mitsuba_tpu.models.film import ReconstructionFilter
from mitsuba_tpu.utils.chi2 import PlanarDomain, SphericalDomain, chi2_test
from mitsuba_tpu.utils.scenes import cornell_box_dict


def test_marginal2d_chi2():
    rng_np = np.random.default_rng(0)
    table = rng_np.uniform(0.1, 2.0, (16, 32)).astype(np.float32)
    d = Marginal2D.create(table)

    def sample_fn(n, seed):
        lanes = jnp.arange(n, dtype=jnp.uint32)
        u2 = rng.sample_2d(jnp.uint32(seed), lanes, jnp.uint32(0))
        uv, _ = d.sample(u2)
        # map [0,1]^2 -> planar domain [-1,1]^2
        return np.asarray(uv) * 2.0 - 1.0

    def pdf_fn(p):
        uv = (np.asarray(p) + 1.0) * 0.5
        flat = jnp.asarray(uv.reshape(-1, 2), jnp.float32)
        pd = d.pdf(flat)
        return np.asarray(pd).reshape(p.shape[:-1]) * 0.25  # jacobian

    passed, msg = chi2_test(sample_fn, pdf_fn, PlanarDomain(),
                            sample_count=200_000)
    assert passed, msg


def test_envmap_sampling_consistency():
    """pdf_direction integrates to 1 over the sphere (MC over uniform
    directions), sample()'s claimed pdf matches pdf_direction at the
    sampled points, and uv<->direction round-trips.  (A chi2 in the
    (phi, cos) domain is ill-conditioned at the poles where the lat-long
    pdf has an integrable 1/sin singularity.)"""
    from mitsuba_tpu.core import warp
    from mitsuba_tpu.core.records import DirectionSample

    rng_np = np.random.default_rng(1)
    data = rng_np.uniform(0.05, 1.0, (32, 64, 3)).astype(np.float32)
    data[5:10, 20:30] *= 50.0  # bright patch to stress importance sampling
    e = EnvmapEmitter.create(data)

    def make_ds(d):
        n = d.shape[0]
        return DirectionSample(
            p=jnp.zeros((n, 3)), n=jnp.zeros((n, 3)), uv=jnp.zeros((n, 2)),
            d=jnp.asarray(d, jnp.float32), dist=jnp.ones((n,)),
            pdf=jnp.zeros((n,)), delta=jnp.zeros((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )

    # 1. normalization: E_uniform[pdf] * 4pi == 1
    n = 400_000
    lanes = jnp.arange(n, dtype=jnp.uint32)
    u2 = rng.sample_2d(jnp.uint32(3), lanes, jnp.uint32(0))
    d_uni = warp.square_to_uniform_sphere(u2)
    pdf_vals = np.asarray(e.pdf_direction(jnp.zeros((n, 3)), make_ds(d_uni)))
    integral = pdf_vals.mean() * 4.0 * np.pi
    assert abs(integral - 1.0) < 0.02, integral

    # 2. sample()'s pdf agrees with pdf_direction at the sampled points
    s2 = rng.sample_2d(jnp.uint32(4), lanes[:50_000], jnp.uint32(0))
    ds, w = e.sample_direction(jnp.zeros((50_000, 3)), None, s2)
    pdf_re = np.asarray(e.pdf_direction(jnp.zeros((50_000, 3)), ds))
    claimed = np.asarray(ds.pdf)
    m = claimed > 1e-6
    rel = np.abs(pdf_re[m] - claimed[m]) / claimed[m]
    assert np.quantile(rel, 0.99) < 1e-3, np.quantile(rel, 0.99)

    # 3. importance: mean sampled radiance >> mean radiance
    le = np.asarray(e._bilinear(ds.uv))
    assert le.mean() > 3.0 * data.mean()

    # 4. uv -> dir -> uv roundtrip
    uv = jnp.asarray(rng_np.uniform(0.02, 0.98, (1000, 2)), jnp.float32)
    d, _ = e._uv_to_dir(uv)
    uv_back = np.asarray(e._dir_to_uv(d))
    np.testing.assert_allclose(uv_back, np.asarray(uv), atol=1e-4)


def test_envmap_render_matches_constant():
    """A constant-texel envmap must render like a ConstantEmitter."""
    d = cornell_box_dict(width=16, height=16, spp=32)
    for k in ("light",):
        d[k].pop("emitter")
    d["env"] = {"type": "envmap",
                "data": np.full((8, 16, 3), 0.8, np.float32)}
    scene = load_dict(d)
    img_env = np.asarray(render(scene))
    d2 = cornell_box_dict(width=16, height=16, spp=32)
    d2["light"].pop("emitter")
    d2["env"] = {"type": "constant", "radiance": 0.8}
    img_const = np.asarray(render(load_dict(d2)))
    assert abs(img_env.mean() / img_const.mean() - 1.0) < 0.05


def test_spot_light_renders():
    d = cornell_box_dict(width=16, height=16, spp=32)
    d["light"].pop("emitter")
    d["spot"] = {"type": "spot", "position": [0, 0.9, 0],
                 "direction": [0, -1, 0], "intensity": 10.0,
                 "cutoff_angle": 40.0}
    img = np.asarray(render(load_dict(d)))
    assert np.isfinite(img).all()
    # floor brighter than ceiling (spot aims down; ceiling gets indirect)
    assert img[12:15].mean() > img[1:4].mean()


def test_aov_integrator():
    from mitsuba_tpu.models.integrators.aov import AOVIntegrator, render_aov
    from mitsuba_tpu.utils.scenes import cornell_box

    scene = cornell_box(width=16, height=16)
    integ = AOVIntegrator(aovs=("depth", "sh_normals", "position"))
    out = render_aov(scene, integ, seed=0, spp=4)
    assert set(out) == {"depth", "sh_normals", "position"}
    assert out["depth"].shape == (16, 16, 1)
    d = np.asarray(out["depth"])
    assert (d > 1.0).all() and (d < 10.0).all()  # box is 2.9..4.9 away
    n = np.asarray(out["sh_normals"])
    # back wall normals point toward camera (+z)
    assert n[8, 8, 2] > 0.9


def test_moment_integrator_variance():
    from mitsuba_tpu.models.integrators import PathIntegrator
    from mitsuba_tpu.models.integrators.aov import render_moments
    from mitsuba_tpu.utils.scenes import cornell_box

    scene = cornell_box(width=12, height=12)
    m1, m2 = render_moments(scene, PathIntegrator(max_depth=3), seed=0,
                            spp=64)
    var = np.asarray(m2) - np.asarray(m1) ** 2
    assert (var >= -1e-4).all()
    assert var.mean() > 0.0  # MC noise exists


@pytest.mark.parametrize("stype", ["stratified", "multijitter", "ldsampler",
                                   "orthogonal"])
def test_samplers_reduce_variance(stype):
    """Stratified-family samplers must not be worse than independent for
    pixel-mean estimation on a smooth integrand."""
    d = cornell_box_dict(width=8, height=8, spp=16)
    d["sensor"]["sampler"] = {"type": stype, "sample_count": 16}
    scene = load_dict(d)
    img = np.asarray(render(scene))
    assert np.isfinite(img).all() and img.mean() > 0.05


@pytest.mark.parametrize("kind", ["mitchell", "catmullrom", "lanczos"])
def test_rfilters_normalized(kind):
    f = getattr(ReconstructionFilter, kind)()
    xs = jnp.linspace(-f.radius, f.radius, 2001)
    vals = np.asarray(f.eval_1d(xs))
    integral = vals.sum() * (2 * f.radius / 2000)
    assert abs(integral - 1.0) < 0.05, (kind, integral)
    assert abs(float(f.eval_1d(jnp.asarray(0.0))) - 1.0) < 0.2


def test_orthographic_and_radiancemeter():
    d = cornell_box_dict(width=16, height=16, spp=16)
    d["sensor"] = {
        "type": "orthographic", "scale_x": 2.0, "scale_y": 2.0,
        "to_world": d["sensor"]["to_world"],
        "film": {"type": "hdrfilm", "width": 16, "height": 16,
                 "rfilter": {"type": "box"}},
        "sampler": {"type": "independent", "sample_count": 16},
    }
    img = np.asarray(render(load_dict(d)))
    assert np.isfinite(img).all() and img.mean() > 0.03

    d["sensor"] = {
        "type": "radiancemeter",
        "to_world": d["sensor"]["to_world"],
        "film": {"type": "hdrfilm", "width": 1, "height": 1,
                 "rfilter": {"type": "box"}},
        "sampler": {"type": "independent", "sample_count": 64},
    }
    img = np.asarray(render(load_dict(d)))
    assert img.shape == (1, 1, 3) and np.isfinite(img).all()


def test_radialwarp_distorts():
    """[FORK] radialwarp: k_warp shrinks off-axis directions (pincushion),
    and k_warp=0 reduces to the perspective camera."""
    base = cornell_box_dict(width=24, height=24, spp=8)
    persp = np.asarray(render(load_dict(base)))

    d0 = cornell_box_dict(width=24, height=24, spp=8)
    d0["sensor"] = dict(d0["sensor"], type="radialwarp", k_warp=0.0)
    d0["sensor"].pop("focus_distance", None)
    img0 = np.asarray(render(load_dict(d0)))
    np.testing.assert_allclose(img0, persp, atol=2e-2)

    d1 = cornell_box_dict(width=24, height=24, spp=8)
    d1["sensor"] = dict(d1["sensor"], type="radialwarp", k_warp=3.0)
    img1 = np.asarray(render(load_dict(d1)))
    assert np.abs(img1 - persp).mean() > 1e-3  # visibly different

    # k_warp is differentiable (through the loop-free direct integrator;
    # loop integrators differentiate via PRB instead)
    from mitsuba_tpu.models.integrators import DirectIntegrator

    scene = load_dict(d1)

    def f(k):
        cam = scene.sensor.replace(k_warp=k)
        return jnp.mean(render(scene.replace(sensor=cam),
                               DirectIntegrator(), spp=4))

    g = float(jax.grad(f)(jnp.asarray(1.0)))
    assert np.isfinite(g) and abs(g) > 0.0


def test_largesteps_roundtrip_and_smoothing():
    from mitsuba_tpu.models.shapes import sphere_mesh
    from mitsuba_tpu.utils.largesteps import LargeSteps

    v, f, *_ = sphere_mesh(2)
    ls = LargeSteps(v, f, lambda_=5.0)
    x = jnp.asarray(v)
    u = ls.to_differential(x)
    x_back = ls.from_differential(u)
    np.testing.assert_allclose(np.asarray(x_back), np.asarray(x), atol=1e-3)

    # preconditioned gradient of a single-vertex delta spreads smoothly
    g = jnp.zeros_like(x).at[0, 0].set(1.0)
    g_pre = np.asarray(ls.from_differential(g))
    assert g_pre[0, 0] > 0
    # neighbors receive a share of the gradient
    neighbors = np.asarray(f)[np.any(np.asarray(f) == 0, axis=1)].ravel()
    neighbors = [i for i in set(neighbors.tolist()) if i != 0]
    assert all(abs(g_pre[i, 0]) > 1e-5 for i in neighbors)
    # differentiable
    grad = jax.grad(lambda u: jnp.sum(ls.from_differential(u) ** 2))(u)
    assert np.isfinite(np.asarray(grad)).all()


def test_checkpoint_roundtrip(tmp_path):
    from mitsuba_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    params = {"a": jnp.asarray([1.0, 2.0]), "m": {"v": jnp.ones((3, 2))}}
    p = save_checkpoint(str(tmp_path / "ckpt"), params)
    back = load_checkpoint(p, params)
    np.testing.assert_allclose(np.asarray(back["a"]), [1.0, 2.0])
    np.testing.assert_allclose(np.asarray(back["m"]["v"]), np.ones((3, 2)))


def test_logging_and_progress(capsys):
    import io

    from mitsuba_tpu.utils import logging as mlog

    buf = io.StringIO()
    pr = mlog.ProgressReporter("Test", stream=buf)
    pr.update(0.5)
    pr.update(1.0)
    out = buf.getvalue()
    assert "50.0%" in out and "100.0%" in out
    with mlog.scoped_phase("unit-test-phase"):
        pass


def test_cylinder_and_instancing():
    from mitsuba_tpu.models.shapes import Mesh, cylinder_mesh, instance_meshes
    from mitsuba_tpu.core import transform as tf

    v, f, n, uv = cylinder_mesh(n_seg=16, radius=0.5, capped=True)
    assert np.isfinite(v).all()
    # capped cylinder is closed:每 edge shared by exactly 2 faces
    edges = {}
    for tri in np.asarray(f):
        for a, b in ((0, 1), (1, 2), (2, 0)):
            e = tuple(sorted((int(tri[a]), int(tri[b]))))
            edges[e] = edges.get(e, 0) + 1
    assert set(edges.values()) == {2}

    base = Mesh.make(v, f, normals=n, uvs=uv, bsdf_index=0)
    insts = instance_meshes(base, [
        np.asarray(tf.translate([2, 0, 0]), np.float32),
        np.asarray(tf.translate([-2, 0, 0]), np.float32),
    ])
    assert len(insts) == 2
    c0 = np.asarray(insts[0].vertices).mean(0)
    c1 = np.asarray(insts[1].vertices).mean(0)
    np.testing.assert_allclose(c0[0] - c1[0], 4.0, atol=1e-5)


def test_principled_chi2_and_furnace():
    from mitsuba_tpu.models import bsdfs as B
    from mitsuba_tpu.models.textures import ConstantTexture
    from mitsuba_tpu.core.math import normalize as _nrm

    b = B.Principled(base_color=ConstantTexture(jnp.full((3,), 0.8)),
                     metallic=jnp.asarray(0.5), roughness=jnp.asarray(0.4))
    wi = _nrm(jnp.asarray([0.3, -0.15, 0.94]))

    class SI:
        def __init__(self, n):
            self.wi = jnp.broadcast_to(wi, (n, 3))
            self.uv = jnp.zeros((n, 2))

    def sample_fn(n, seed):
        si = SI(n)
        lanes = jnp.arange(n, dtype=jnp.uint32)
        s1 = rng.sample_1d(jnp.uint32(seed), lanes, jnp.uint32(0))
        s2 = rng.sample_2d(jnp.uint32(seed), lanes, jnp.uint32(1))
        bs, w = b.sample(si, s1, s2, jnp.ones(n, bool))
        return np.asarray(bs.wo)[np.asarray(bs.pdf) > 0]

    def pdf_fn(d):
        flat = d.reshape(-1, 3)
        si = SI(flat.shape[0])
        return np.asarray(
            b.pdf(si, flat, jnp.ones(flat.shape[0], bool))
        ).reshape(d.shape[:-1])

    passed, msg = chi2_test(sample_fn, pdf_fn, SphericalDomain(),
                            sample_count=200_000)
    assert passed, msg


def test_normalmap_tilts_reflection():
    from mitsuba_tpu.models import bsdfs as B
    from mitsuba_tpu.models.textures import ConstantTexture

    inner = B.SmoothConductor(eta=jnp.asarray([0.2, 0.9, 1.1]),
                              k=jnp.asarray([3.9, 2.4, 2.1]))
    # normal tilted toward +x in tangent space
    tex = ConstantTexture(jnp.asarray([0.7, 0.5, 0.9]))
    b = B.NormalMap(nested=inner, normalmap=tex)

    class SI:
        def __init__(self, n):
            self.wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
            self.uv = jnp.zeros((n, 2))

    n = 4
    si = SI(n)
    bs, w = b.sample(si, jnp.zeros((n,)), jnp.zeros((n, 2)),
                     jnp.ones((n,), bool))
    wo = np.asarray(bs.wo[0])
    flat_wo = np.array([0.0, 0.0, 1.0])  # mirror about untilted normal
    assert np.linalg.norm(wo - flat_wo) > 0.1  # reflection deviates
    assert wo[0] > 0.1  # tilted toward +x


def test_dim_stratification_reduces_image_noise():
    """All-dims stratification (rng spec threading): stratified spp=16
    render must have lower MSE vs a spp=128 reference than independent."""
    import mitsuba_tpu as mi

    ref_d = mi.cornell_box_dict(width=16, height=16, spp=128)
    ref = np.asarray(mi.render(mi.load_dict(ref_d)))

    mses = {}
    for stype in ("independent", "stratified"):
        d = mi.cornell_box_dict(width=16, height=16, spp=16)
        d["sensor"]["sampler"] = {"type": stype, "sample_count": 16}
        acc = 0.0
        for seed in range(3):
            img = np.asarray(mi.render(mi.load_dict(d), seed=seed, spp=16))
            acc += float(((img - ref) ** 2).mean())
        mses[stype] = acc / 3
    # NEE + BSDF + film dims all stratified: expect a clear win
    assert mses["stratified"] < mses["independent"] * 0.9, mses
