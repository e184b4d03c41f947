from .mesh import make_mesh  # noqa: F401
from .pipeline import jit_stabilize_step, sharded_stabilize  # noqa: F401
