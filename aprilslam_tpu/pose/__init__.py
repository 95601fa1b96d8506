from .pnp import solve_planar_pnp, poses_from_detections

__all__ = ["solve_planar_pnp", "poses_from_detections"]
