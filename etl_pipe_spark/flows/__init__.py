from .clearsight import (
    event_data_flow,
    node_calc_flow,
    node_data_flow,
    runs_flow,
    scenarios_flow,
    timeline_flow,
)

__all__ = [
    "scenarios_flow", "node_data_flow", "runs_flow",
    "node_calc_flow", "event_data_flow", "timeline_flow",
]
