"""Function layer coverage: periodize, interpolate_points, Function2d."""
import numpy as np
import pytest

import jax.numpy as jnp

from flan_tpu import Function, Function2d, as_function, interpolators


def test_constant_short_circuit():
    f = as_function(3.5)
    assert f.is_constant
    assert f.sample(0, 100, 0.01) == 3.5
    g = as_function(lambda t: t * 2)
    s = g.sample(0, 4, 0.5)
    np.testing.assert_allclose(np.asarray(s), [0.0, 1.0, 2.0, 3.0])


def test_periodize():
    f = Function(lambda t: t).periodize(1.0)
    vals = np.asarray(f(jnp.asarray([0.25, 1.25, 2.75])))
    np.testing.assert_allclose(vals, [0.25, 0.25, 0.75], atol=1e-6)


def test_function_arithmetic():
    f = as_function(2.0) * as_function(3.0)
    assert f.constant_value == 6.0
    g = Function(lambda t: t) + 1.0
    assert float(np.asarray(g(jnp.float32(2.0)))) == 3.0
    h = -Function(lambda t: t)
    assert float(np.asarray(h(jnp.float32(2.0)))) == -2.0


def test_function2d_grid():
    f = Function2d(lambda t, fr: t + fr)
    grid = f.sample_grid(3, 1.0, 2, 10.0)
    np.testing.assert_allclose(np.asarray(grid),
                               [[0, 10], [1, 11], [2, 12]])


def test_interpolate_points():
    fn = interpolators.interpolate_points([(0, 0), (1, 10), (2, 0)])
    vals = np.asarray(fn(jnp.asarray([-1.0, 0.5, 1.5, 3.0])))
    np.testing.assert_allclose(vals, [0.0, 5.0, 5.0, 0.0], atol=1e-5)


def test_interpolate_intervals():
    fn = interpolators.interpolate_intervals(0.5, [1.0, 2.0, 3.0])
    assert float(np.asarray(fn(jnp.float32(0.25)))) == pytest.approx(1.5)


def test_scalar_fallback():
    """A callable that only works on scalars falls back gracefully."""
    def scalar_only(t):
        return 1.0 if float(t) > 0.5 else 0.0

    f = as_function(scalar_only)
    s = np.asarray(f.sample(0, 4, 0.3))
    np.testing.assert_allclose(s, [0.0, 0.0, 1.0, 1.0])
