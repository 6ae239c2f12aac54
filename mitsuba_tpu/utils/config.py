"""Variant / runtime configuration axis.

The reference compiles a binary per *variant* — backend x color mode x
precision, generated from mitsuba.conf (CMakeLists.txt:106-188,
resources/mitsuba.conf.template) and selected at runtime with
``mi.set_variant("llvm_ad_rgb")``.  Under JAX one build serves every
backend (XLA retargets) and AD is always available, so the only variant
axes with runtime meaning here are the **color mode** (rgb vs
hero-wavelength spectral) and the compute dtype policy:

- color mode sets the default ``spectral`` flag for sensors built by the
  dict/XML loaders (explicit per-sensor flags still win), mirroring how
  the reference's spectral variants switch ``Spectrum`` from RGB triples
  to sampled wavelengths (spectrum.h:541);
- dtype is reported (and validated) but f32 is the only supported
  compute dtype on TPU — f64 falls back to XLA's software path and is
  rejected loudly rather than silently slow.

Reference-style variant strings are accepted and collapse onto these
axes: "scalar_rgb", "llvm_ad_rgb", "cuda_ad_rgb" -> "rgb";
"*_spectral" -> "spectral".
"""
from __future__ import annotations

_COLOR_MODES = ("rgb", "spectral")
_state = {"color": "rgb", "name": "rgb"}


def variants() -> tuple:
    """All accepted variant names (mi.variants() parity)."""
    ref = tuple(f"{b}_{m}" for b in ("scalar", "llvm_ad", "cuda_ad")
                for m in _COLOR_MODES)
    return _COLOR_MODES + ref


def set_variant(name: str) -> None:
    """Select the runtime variant (mi.set_variant, src/python/__init__.py).

    Accepts the short color-mode names ("rgb", "spectral") or any
    reference variant string whose suffix names the color mode.
    """
    short = name.rsplit("_", 1)[-1]
    if short not in _COLOR_MODES:
        raise ValueError(
            f"unknown variant {name!r}; expected one of {variants()}")
    if "double" in name or name.endswith("_f64"):
        raise ValueError("f64 variants are not supported on TPU")
    _state["color"] = short
    _state["name"] = name


def variant() -> str:
    """Currently selected variant string (mi.variant parity)."""
    return _state["name"]


def color_mode() -> str:
    """'rgb' or 'spectral' — the loader's default sensor spectral flag."""
    return _state["color"]


def is_spectral() -> bool:
    return _state["color"] == "spectral"
