"""Multi-chip / multi-host SPMD rendering (see mesh.py, distributed.py)."""
from .distributed import init_distributed  # noqa: F401
from .mesh import (  # noqa: F401
    make_mesh,
    render_backward_sharded,
    render_nlos_exhaustive_sharded,
    render_sharded,
)
