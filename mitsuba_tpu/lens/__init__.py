from .materials import AIR, NBK7, DispersiveMaterial  # noqa: F401
from .elements import (  # noqa: F401
    ApertureStop,
    AsphericalLens,
    PlanoLens,
    SpheroidLens,
    offset_element,
)
from .designs import build_design, build_lens_from_data  # noqa: F401
from .camera import (  # noqa: F401
    RealisticLensCamera,
    compute_exit_pupil_lut,
    focus_thick_lens,
    make_lens_camera,
    thick_lens_approximation,
)
from .surfaces import ConicSurface, EvenAsphericSurface  # noqa: F401
from .lens_system import LensMaterial, LensSystem  # noqa: F401
from .losses import rms_loss, rms_loss_and_center  # noqa: F401
from .design import DesignProblem, FieldSource  # noqa: F401
