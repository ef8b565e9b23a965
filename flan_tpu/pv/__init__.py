"""PV algorithm surface: binds method groups onto the PV class."""
from flan_tpu.pv.pv import PV
from flan_tpu.pv import algorithms as _algorithms
from flan_tpu.pv import information as _information
from flan_tpu.pv import modify_extra as _modify_extra
from flan_tpu.graph import conversions as _graphing


def _bind(module, names):
    for name in names:
        setattr(PV, name, getattr(module, name))


_bind(_algorithms, [
    "select", "freeze", "replace_amplitudes", "subtract_amplitudes",
    "add_octaves", "add_harmonics", "shape", "retain_n_loudest_partials",
    "remove_n_loudest_partials", "resonate", "perturb",
])
PV.get_bin_interpolated = _algorithms.get_bin_interpolated
PV.getBinInterpolated = _algorithms.get_bin_interpolated
PV.synthesize = staticmethod(_algorithms.synthesize)
_bind(_information, ["get_salience", "get_contours", "prism"])
PV.Salience = _information.Salience
PV.Contour = _information.Contour
_bind(_modify_extra, [
    "desample", "smear_time", "time_extrapolate", "stretch_spline",
    "modify",
])

PV.convert_to_graph = _graphing.pv_convert_to_graph
PV.save_to_bmp = _graphing.pv_save_to_bmp

__all__ = ["PV"]
