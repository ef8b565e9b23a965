"""Pallas lane-parallel recurrence vs the tiled associative scan.

Runs under pallas interpret mode on CPU (the real kernel path compiles
only on TPU). The kernel is a reference implementation that is NOT wired
into the filter paths: on-chip measurement showed the tiled XLA scan is
~3x faster for the shapes here (see tools/pallas_scan_experiment.py and
docs/STATUS.md item 18), so it is kept for future RDMA/kernel work only.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import importlib.util as _ilu
import os as _os

_spec = _ilu.spec_from_file_location(
    "pallas_scan_experiment",
    _os.path.join(_os.path.dirname(__file__), "..", "tools",
                  "pallas_scan_experiment.py"))
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
linear_recurrence_pallas = _mod.linear_recurrence_pallas
from flan_tpu.ops.scan import linear_recurrence


@pytest.mark.parametrize("n", [1000, 1024 * 3 + 17, 1024 * 300 + 5])
def test_matches_tiled_scan(n):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0.9, 0.9999, (2, n)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32) * 0.1)
    y0 = jnp.asarray(np.float32([0.3, -0.2]))
    ref = linear_recurrence(a, b, y0=y0[:, None])
    out = linear_recurrence_pallas(a, b, y0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gradient_matches_scan_gradient():
    rng = np.random.default_rng(1)
    n = 4096
    a = jnp.asarray(rng.uniform(0.9, 0.999, (1, n)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((1, n)).astype(np.float32) * 0.1)
    y0 = jnp.asarray(np.float32([0.1]))

    def loss_p(a_, b_, y0_):
        y = linear_recurrence_pallas(a_, b_, y0_)
        return jnp.sum(y * y)

    def loss_s(a_, b_, y0_):
        y = linear_recurrence(a_, b_, y0=y0_[:, None])
        return jnp.sum(y * y)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(a, b, y0)
    gs = jax.grad(loss_s, argnums=(0, 1, 2))(a, b, y0)
    for p, s in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(p), np.asarray(s),
                                   rtol=1e-3, atol=1e-3)
