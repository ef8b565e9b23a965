"""Fused streaming pipelines for production-scale processing."""
from flan_tpu.pipelines.stretch import pv_stretch_pipeline

__all__ = ["pv_stretch_pipeline"]
