"""Host-side renderers for qualitative video logging (reference ``renderers/``
plus the points/source-video renderers it pulls from pedestrians_scenarios)."""
from .points_renderer import PointsRenderer
from .renderer import Renderer
