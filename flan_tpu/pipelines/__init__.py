"""Fused streaming pipelines for production-scale processing."""
from flan_tpu.pipelines.stretch import pv_stretch_pipeline
from flan_tpu.pipelines.streamed import (pv_morph_pipeline,
                                         pv_repitch_pipeline,
                                         streamed_pv_process)

__all__ = ["pv_stretch_pipeline", "pv_repitch_pipeline",
           "pv_morph_pipeline", "streamed_pv_process"]
