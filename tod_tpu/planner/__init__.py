from tod_tpu.planner.api import plan  # noqa: F401
from tod_tpu.planner.dijkstra import dijkstra_grid, extract_directions  # noqa: F401
from tod_tpu.planner.tpu_relax import bellman_ford_grid  # noqa: F401
