"""Variant config axis + cooperative cancel/timeout.

Reference parity: mi.set_variant/mi.variant (src/python/__init__.py,
variants from mitsuba.conf, CMakeLists.txt:106-188) and
Integrator::cancel()/timeout (integrator.h:290, integrator.cpp:90-92).
"""
import numpy as np
import jax.numpy as jnp
import pytest

import mitsuba_tpu as mi
from mitsuba_tpu.models.integrators import common as integ_common
from mitsuba_tpu.utils import config, interrupt


@pytest.fixture(autouse=True)
def _reset():
    yield
    mi.set_variant("rgb")
    mi.clear_cancel()


def test_variant_roundtrip_and_aliases():
    assert mi.variant() in mi.variants()
    mi.set_variant("spectral")
    assert config.is_spectral()
    mi.set_variant("llvm_ad_rgb")          # reference-style alias
    assert not config.is_spectral()
    assert mi.variant() == "llvm_ad_rgb"
    mi.set_variant("cuda_ad_spectral")
    assert config.color_mode() == "spectral"
    with pytest.raises(ValueError):
        mi.set_variant("scalar_mono_double")


def test_variant_sets_loader_spectral_default():
    mi.set_variant("spectral")
    scene = mi.load_dict(mi.cornell_box_dict(width=8, height=8, spp=2))
    assert scene.sensor.spectral
    mi.set_variant("rgb")
    scene = mi.load_dict(mi.cornell_box_dict(width=8, height=8, spp=2))
    assert not scene.sensor.spectral
    # explicit per-sensor flag wins over the variant default
    mi.set_variant("spectral")
    d = mi.cornell_box_dict(width=8, height=8, spp=2)
    d["sensor"]["spectral"] = False
    assert not mi.load_dict(d).sensor.spectral


def test_timeout_stops_between_passes(monkeypatch):
    scene = mi.load_dict(mi.cornell_box_dict(width=16, height=16, spp=8))
    calls = []
    real = integ_common._render_pass

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(integ_common, "_render_pass", counting)
    # timeout already elapsed when the second pass is reached -> exactly
    # one pass runs, and the partial image is still developed/normalized
    img = integ_common.render(scene, seed=0, spp=8, spp_per_pass=2,
                              timeout=1e-9)
    assert len(calls) == 1
    assert np.isfinite(np.asarray(img)).all()
    assert float(jnp.mean(img)) > 0.01

    calls.clear()
    img_full = integ_common.render(scene, seed=0, spp=8, spp_per_pass=2)
    assert len(calls) == 4
    # partial (2 spp) and full (8 spp) agree in expectation
    assert abs(float(jnp.mean(img_full)) - float(jnp.mean(img))) < 0.05


def test_cancel_flag_stops_render(monkeypatch):
    scene = mi.load_dict(mi.cornell_box_dict(width=16, height=16, spp=4))
    calls = []
    real = integ_common._render_pass

    def cancelling(*a, **k):
        calls.append(1)
        mi.cancel()          # user hits ctrl-c after the first pass
        return real(*a, **k)

    monkeypatch.setattr(integ_common, "_render_pass", cancelling)
    img = integ_common.render(scene, seed=0, spp=4, spp_per_pass=1)
    assert len(calls) == 1
    assert np.isfinite(np.asarray(img)).all()
    assert interrupt.cancel_requested()
    mi.clear_cancel()
    assert not interrupt.cancel_requested()


def test_integrator_timeout_property_via_loader():
    d = mi.cornell_box_dict(width=8, height=8, spp=2)
    d["integrator"] = {"type": "path", "max_depth": 3, "timeout": 12.5}
    scene = mi.load_dict(d)
    assert scene.integrator.timeout == 12.5
