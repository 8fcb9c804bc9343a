from .ngp import NGPConfig, NGP, OccupancyState

__all__ = ["NGPConfig", "NGP", "OccupancyState"]
