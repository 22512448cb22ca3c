from .logging import get_logger
from .metrics_sink import MetricsSink

__all__ = ["get_logger", "MetricsSink"]
