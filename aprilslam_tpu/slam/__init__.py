from .graph import (
    GraphState,
    init_graph,
    update_graph,
    estimate_pose_average,
    average_distance_to_nodes,
    NO_ANCHOR,
)
from .localize import joint_camera_pose
from .pipeline import SlamSystem, SlamOutputs, build_slam_step
from .ba import BAState, ba_init, ba_add_frame, ba_optimize, ba_cost, latest_pose
from .pgo import PoseGraphEdges, edges_init, add_edge, edges_from_trajectory, pgo_optimize, pgo_cost
from .loop import PgoState, pgo_init, pgo_track_frame, apply_node_deltas

__all__ = [
    "GraphState",
    "init_graph",
    "update_graph",
    "estimate_pose_average",
    "average_distance_to_nodes",
    "NO_ANCHOR",
    "joint_camera_pose",
    "SlamSystem",
    "SlamOutputs",
    "build_slam_step",
]
