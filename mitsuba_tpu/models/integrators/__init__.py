from .common import render, sample_rays, mis_weight  # noqa: F401
from .path import PathIntegrator  # noqa: F401
from .megapath import MegakernelPathIntegrator  # noqa: F401
from .direct import DirectIntegrator  # noqa: F401
from .depth import DepthIntegrator  # noqa: F401
from .prb import PRBIntegrator, prb_render  # noqa: F401
from .prb_basic import PRBBasicIntegrator  # noqa: F401
from .ptracer import ParticleTracerIntegrator, render_ptracer  # noqa: F401
from .volpath import VolPathIntegrator  # noqa: F401
from .prbvolpath import PRBVolPathIntegrator  # noqa: F401
from .projective import (  # noqa: F401
    DirectProjectiveIntegrator,
    PathProjectiveIntegrator,
    build_silhouette_edges,
    prb_projective_render,
)
from .aov import AOVIntegrator, MomentIntegrator, render_aov, render_moments  # noqa: F401
from .stokes import StokesIntegrator  # noqa: F401
from .volpathmis import VolPathMISIntegrator  # noqa: F401
