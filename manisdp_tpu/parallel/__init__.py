from .mesh import (make_mesh, sharded_maxcut_solve, batched_maxcut_solve)

__all__ = ["make_mesh", "sharded_maxcut_solve", "batched_maxcut_solve"]
