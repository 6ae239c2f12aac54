"""XML loader tests: schema coverage + parity with the dict loader."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu import load_dict, render
from mitsuba_tpu.utils.scenes import cornell_box_dict
from mitsuba_tpu.utils.xml import load_file, xml_to_dict

_XML = """
<scene version="3.0.0">
    <default name="spp" value="8"/>
    <integrator type="path"><integer name="max_depth" value="3"/></integrator>
    <sensor type="perspective">
        <string name="fov_axis" value="smaller"/>
        <float name="fov" value="39.3077"/>
        <float name="near_clip" value="0.001"/>
        <float name="far_clip" value="100"/>
        <transform name="to_world">
            <lookat origin="0, 0, 3.9" target="0, 0, 0" up="0, 1, 0"/>
        </transform>
        <sampler type="independent">
            <integer name="sample_count" value="$spp"/>
        </sampler>
        <film type="hdrfilm">
            <integer name="width" value="16"/>
            <integer name="height" value="16"/>
            <rfilter name="rfilter" type="gaussian"/>
        </film>
    </sensor>
    <bsdf type="diffuse" id="white">
        <rgb name="reflectance" value="0.885809, 0.698859, 0.666422"/>
    </bsdf>
    <shape type="rectangle" id="light">
        <transform name="to_world">
            <scale value="0.23, 0.19, 0.19"/>
            <rotate x="1" angle="90"/>
            <translate x="0" y="0.99" z="0.01"/>
        </transform>
        <ref id="white"/>
        <emitter type="area">
            <rgb name="radiance" value="18.387, 13.9873, 6.75357"/>
        </emitter>
    </shape>
    <shape type="rectangle" id="floor">
        <transform name="to_world">
            <rotate x="1" angle="-90"/>
            <translate y="-1"/>
        </transform>
        <ref id="white"/>
    </shape>
    <shape type="rectangle" id="back">
        <transform name="to_world"><translate z="-1"/></transform>
        <ref id="white"/>
    </shape>
</scene>
"""


def test_xml_parses_schema():
    d = xml_to_dict(_XML)
    assert d["integrator"]["max_depth"] == 3
    assert d["sensor"]["sampler"]["sample_count"] == 8  # $spp substituted
    assert d["light"]["emitter"]["type"] == "area"
    assert d["light"]["bsdf"] == {"type": "ref", "id": "white"}
    w = d["light"]["to_world"]
    assert w.shape == (4, 4)
    # translate(0,0.99,0.01) @ rotate @ scale: translation column survives
    np.testing.assert_allclose(w[:3, 3], [0, 0.99, 0.01], atol=1e-6)


def test_xml_matches_dict_loader(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(_XML)
    scene_x = load_file(str(p))
    img_x = np.asarray(render(scene_x))

    # equivalent dict scene (subset of the cornell box)
    d = cornell_box_dict(width=16, height=16, spp=8)
    d["integrator"]["max_depth"] = 3
    for k in ("ceiling", "green-wall", "red-wall", "small-box", "large-box",
              "green", "red"):
        d.pop(k)
    img_d = np.asarray(render(load_dict(d)))
    np.testing.assert_allclose(img_x, img_d, rtol=1e-4, atol=1e-5)


def test_xml_defaults_override(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(_XML)
    scene = load_file(str(p), defaults={"spp": 2})
    assert scene.sensor.sampler.sample_count == 2


def test_upgrade_tree_v1_scene():
    """Pre-2.0 scene files are migrated in memory (xml.cpp:302):
    camelCase names, lookAt tags, and diffuseReflectance."""
    from mitsuba_tpu.utils.xml import xml_to_dict

    xml = """
    <scene version="0.6.0">
      <sensor type="perspective">
        <float name="nearClip" value="0.01"/>
        <transform name="toWorld">
          <lookAt origin="0,0,-3" target="0,0,0" up="0,1,0"/>
        </transform>
      </sensor>
      <bsdf type="diffuse" id="_mat">
        <rgb name="diffuseReflectance" value="0.4 0.5 0.6"/>
      </bsdf>
      <shape type="rectangle">
        <ref id="_mat"/>
      </shape>
    </scene>
    """
    d = xml_to_dict(xml)
    sensor = [v for v in d.values()
              if isinstance(v, dict) and v.get("type") == "perspective"][0]
    assert "near_clip" in sensor
    assert "to_world" in sensor
    mats = [v for v in d.values()
            if isinstance(v, dict) and v.get("type") == "diffuse"]
    assert mats and "reflectance" in mats[0]


REF_SCENES = "/root/reference/notebooks/scenes/cboxes"


@pytest.mark.skipif(not os.path.isdir(REF_SCENES),
                    reason="reference checkout not present")
@pytest.mark.parametrize("fname,spp_kw", [
    ("cbox_ref.xml", {"spp": 2, "res": 24}),
    ("cbox_path.xml", {"res": 24}),          # max_depth=-1 + tessar lens
    ("cbox_real.xml", {"res": 24}),          # realisticlens sensor
    ("focus_near.xml", {"res": 24}),
    ("cbox_ptracer.xml", {"res": 24}),
])
def test_reference_fork_scene_files(fname, spp_kw):
    """The fork's own notebook scene files load and render end-to-end
    (xml.cpp parameter substitution incl. $res vs $resx word
    boundaries, obj meshes, lookat transforms, realisticlens sensors,
    max_depth=-1 semantics)."""
    import numpy as np
    from mitsuba_tpu.utils.xml import load_file
    from mitsuba_tpu.models.integrators.common import render

    sc = load_file(os.path.join(REF_SCENES, fname), **spp_kw)
    img = np.asarray(render(sc, sc.integrator, seed=0, spp=4))
    assert np.isfinite(img).all()
    assert img.mean() > 1e-4, img.mean()
