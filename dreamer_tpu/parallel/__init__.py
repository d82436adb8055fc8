from dreamer_tpu.parallel.mesh import make_mesh
from dreamer_tpu.parallel.sharding import MeshPlan

__all__ = ["make_mesh", "MeshPlan"]
