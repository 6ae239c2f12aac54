"""Runtime/system report (reference: src/python/python/sys_info.py)."""
from __future__ import annotations

import platform
import sys


def sys_info() -> str:
    """Human-readable summary of the Python/JAX/device environment."""
    import jax

    lines = [
        f"mitsuba_tpu on {platform.platform()}",
        f"python  : {sys.version.split()[0]}",
        f"jax     : {jax.__version__}",
        f"backend : {jax.default_backend()}",
    ]
    try:
        devs = jax.devices()
        lines.append(f"devices : {len(devs)} x {devs[0].device_kind}")
    except Exception as e:  # no backend available
        lines.append(f"devices : unavailable ({e})")
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            import importlib

            m = importlib.import_module(mod)
            lines.append(f"{mod:8s}: {getattr(m, '__version__', '?')}")
        except ImportError:
            pass
    return "\n".join(lines)


if __name__ == "__main__":
    print(sys_info())
