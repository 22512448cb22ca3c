"""Serving: bucketed, pipelined CLIP inference (see engine.py)."""

from flyp_tpu.serving.engine import ClipServer

__all__ = ["ClipServer"]
