"""Mitsuba XML scene parsing -> scene dict -> load_dict.

Reference: src/core/xml.cpp (1408 LoC) — tag grammar (<scene>, plugin
tags with <float/integer/string/boolean/rgb/spectrum/point/vector/
transform/ref> properties), `$var` defaults substitution, and
version-aware parsing.  This covers the modern (v2/v3) schema used by the
reference's test scenes; the dict produced feeds utils/load.py (the
PluginManager analogue).
"""
from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import numpy as np

from ..core import transform as tf

_PLUGIN_TAGS = {
    "integrator", "sensor", "shape", "bsdf", "emitter", "sampler", "film",
    "rfilter", "texture", "medium", "phase", "spectrum", "volume",
}


def _parse_value(text):
    t = text.strip()
    try:
        if "," in t or " " in t:
            parts = [float(x) for x in t.replace(",", " ").split()]
            return parts if len(parts) > 1 else parts[0]
        return float(t) if ("." in t or "e" in t or "E" in t) else int(t)
    except ValueError:
        return t


def _sub_defaults(text, defaults):
    if text is None or "$" not in text:
        return text
    # word-boundary substitution, longest names first: `$res` must not
    # eat the prefix of `$resx` (xml.cpp upgrades named params whole)
    import re

    for k in sorted(defaults, key=len, reverse=True):
        text = re.sub(rf"\${re.escape(k)}(?![A-Za-z0-9_])",
                      str(defaults[k]), text)
    return text


def _parse_transform(node, defaults):
    """<transform> children applied in document order (xml.cpp transform
    parsing: later tags multiply on the LEFT)."""
    m = tf.identity()
    for child in node:
        tag = child.tag
        g = lambda name, d=None: _sub_defaults(child.get(name, d), defaults)
        if tag == "translate":
            v = [float(g("x", "0")), float(g("y", "0")), float(g("z", "0"))]
            if child.get("value") is not None:
                v = np.broadcast_to(
                    np.atleast_1d(_parse_value(g("value"))), (3,))
            m = tf.compose(tf.translate(np.asarray(v, np.float32)), m)
        elif tag == "scale":
            if child.get("value") is not None:
                val = _parse_value(g("value"))
                v = val if isinstance(val, list) else [val] * 3
            else:
                v = [float(g("x", "1")), float(g("y", "1")),
                     float(g("z", "1"))]
            m = tf.compose(tf.scale(np.asarray(v, np.float32)), m)
        elif tag == "rotate":
            axis = [float(g("x", "0")), float(g("y", "0")),
                    float(g("z", "0"))]
            m = tf.compose(tf.rotate(np.asarray(axis, np.float32),
                                     float(g("angle", "0"))), m)
        elif tag in ("lookat", "look_at"):
            origin = [float(x) for x in g("origin").replace(",", " ").split()]
            target = [float(x) for x in g("target").replace(",", " ").split()]
            up = [float(x) for x in g("up", "0 1 0").replace(",", " ").split()]
            m = tf.compose(np.asarray(tf.look_at(origin, target, up)), m)
        elif tag == "matrix":
            vals = [float(x) for x in g("value").replace(",", " ").split()]
            mat = np.asarray(vals, np.float32).reshape(4, 4)
            m = tf.compose(mat, m)
    return np.asarray(m, np.float32)


def _parse_plugin(node, defaults, base_dir):
    """Plugin tag -> dict {'type': ..., props...}."""
    out = {"type": _sub_defaults(node.get("type"), defaults)}
    if node.get("id"):
        out["id"] = node.get("id")
    for child in node:
        tag = child.tag
        name = child.get("name")
        val = _sub_defaults(child.get("value"), defaults)
        if tag == "float":
            out[name] = float(val)
        elif tag == "integer":
            out[name] = int(val)
        elif tag == "boolean":
            out[name] = str(val).lower() == "true"
        elif tag == "string":
            if name == "filename" and base_dir and not os.path.isabs(val):
                val = os.path.join(base_dir, val)
            out[name] = val
        elif tag in ("rgb", "srgb"):
            out[name] = {"type": "rgb", "value": _parse_value(val)}
        elif tag == "spectrum":
            out[name] = {"type": "spectrum", "value": _parse_value(val)}
        elif tag in ("point", "vector"):
            if val is not None:
                out[name] = _parse_value(val)
            else:
                out[name] = [
                    float(_sub_defaults(child.get(a, "0"), defaults))
                    for a in ("x", "y", "z")
                ]
        elif tag == "transform":
            out[name] = _parse_transform(child, defaults)
        elif tag == "ref":
            out[name or "bsdf"] = {"type": "ref", "id": child.get("id")}
        elif tag in _PLUGIN_TAGS:
            sub = _parse_plugin(child, defaults, base_dir)
            key = name or tag
            out[key] = sub
    return out




def _camel_to_underscore(name):
    out = []
    i = 0
    while i < len(name):
        c = name[i]
        if i + 1 < len(name) and c.islower() and name[i + 1].isupper():
            out.append(c)
            out.append("_")
            i += 1
            while i < len(name) and name[i].isupper():
                out.append(name[i].lower())
                i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def upgrade_tree(root, version):
    """In-memory version migration of pre-2.0 scene files
    (xml.cpp:302 upgrade_tree): camelCase parameter names become
    underscore_case, <lookAt> becomes <lookat>, reserved '_'-prefixed
    ids are renamed, diffuse's 'diffuse_reflectance' becomes
    'reflectance', and legacy uoffset/voffset/uscale/vscale floats are
    folded into a 'to_uv' transform block."""
    try:
        major = int(str(version).split(".")[0])
    except (ValueError, AttributeError):
        return root
    if major >= 2:
        return root

    for node in root.iter():
        if node.tag == "lookAt":
            node.tag = "lookat"
        if node.tag != "default" and node.get("name"):
            node.set("name", _camel_to_underscore(node.get("name")))
        if node.get("id", "").startswith("_"):
            node.set("id", "ID" + node.get("id") + "__UPGR")

    for bsdf in root.iter("bsdf"):
        if bsdf.get("type") == "diffuse":
            for ch in bsdf:
                if ch.get("name") == "diffuse_reflectance":
                    ch.set("name", "reflectance")

    # uoffset/voffset/uscale/vscale -> <transform name="to_uv">
    for node in root.iter():
        legacy = {ch.get("name"): ch for ch in list(node)
                  if ch.tag == "float" and ch.get("name") in
                  ("uoffset", "voffset", "uscale", "vscale")}
        if not legacy:
            continue
        off = [float(legacy[k].get("value", 0.0))
               if k in legacy else 0.0 for k in ("uoffset", "voffset")]
        scl = [float(legacy[k].get("value", 1.0))
               if k in legacy else 1.0 for k in ("uscale", "vscale")]
        for ch in legacy.values():
            node.remove(ch)
        trafo = ET.SubElement(node, "transform", {"name": "to_uv"})
        if off != [0.0, 0.0]:
            ET.SubElement(trafo, "translate",
                          {"x": str(off[0]), "y": str(off[1])})
        if scl != [1.0, 1.0]:
            ET.SubElement(trafo, "scale",
                          {"x": str(scl[0]), "y": str(scl[1])})
    return root


def xml_to_dict(path_or_string, defaults=None):
    """Parse scene XML into a load_dict-compatible dictionary."""
    defaults = dict(defaults or {})
    if os.path.exists(str(path_or_string)):
        tree = ET.parse(path_or_string)
        root = tree.getroot()
        base_dir = os.path.dirname(os.path.abspath(path_or_string))
    else:
        root = ET.fromstring(path_or_string)
        base_dir = os.getcwd()
    assert root.tag == "scene", f"expected <scene>, got <{root.tag}>"
    root = upgrade_tree(root, root.get("version", "3.0.0"))

    # collect <default name=... value=...>
    for child in root:
        if child.tag == "default":
            defaults.setdefault(child.get("name"), child.get("value"))

    scene = {"type": "scene"}
    counters = {}
    for child in root:
        if child.tag == "default":
            continue
        if child.tag not in _PLUGIN_TAGS:
            continue
        d = _parse_plugin(child, defaults, base_dir)
        key = child.get("id")
        if not key:
            counters[child.tag] = counters.get(child.tag, 0) + 1
            key = (child.tag if counters[child.tag] == 1
                   else f"{child.tag}_{counters[child.tag]}")
        scene[key] = d
    return scene


def load_file(path, defaults=None, **kw):
    """mi.load_file analogue: XML -> Scene.  Keyword arguments
    override the scene's ``<default name="...">`` parameters
    (xml.cpp parameter substitution: mi.load_file(path, spp=16))."""
    from .load import load_dict

    defaults = dict(defaults or {})
    defaults.update({k: str(v) for k, v in kw.items()})
    return load_dict(xml_to_dict(path, defaults))
