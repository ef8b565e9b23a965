from flan_tpu.sqpv.sqpv import SQPV
__all__ = ["SQPV"]
