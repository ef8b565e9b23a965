from flan_tpu.spv.spv import SPV, spv_forward, spv_inverse
__all__ = ["SPV", "spv_forward", "spv_inverse"]
