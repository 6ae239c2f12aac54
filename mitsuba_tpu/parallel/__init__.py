from .wavefront import make_mesh, render_sharded  # noqa: F401
from .prb_sharded import make_sharded_prb  # noqa: F401
