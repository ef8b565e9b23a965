"""Differentiability through the PV compute path.

The reference (C++) cannot do this at all; in this rebuild every device op
(STFT, mod-1 phase scans, searchsorted remap gathers, OLA) is a JAX
program, so gradients flow end to end - usable for optimization-based
audio tasks (matching EQ, differentiable resynthesis, style transfer).
Gradients also flow through algorithm PARAMETERS: a traced scalar passed
where the reference takes a Function routes down the general sampled
path (flan_tpu/func/function.py), so d(loss)/d(cutoff) exists."""
import numpy as np
import jax
import jax.numpy as jnp

SR = 8000.0


def _sine(seconds=0.5, freq=440.0):
    t = np.arange(int(seconds * SR), dtype=np.float32) / SR
    return jnp.asarray((0.5 * np.sin(2 * np.pi * freq * t))[None])


def test_grad_through_fused_stretch_pipeline():
    from flan_tpu.pipelines import pv_stretch_pipeline
    x = _sine()

    def loss(v):
        y = pv_stretch_pipeline(v, 2.0, window_size=512, hop=64,
                                dft_size=512, sample_rate=SR)
        return jnp.sum(y * y)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0
    # forward-mode (jvp) and reverse-mode (vjp) directional derivatives
    # must agree. A finite-difference check is not meaningful here: the
    # phase-wrap rounds make the loss piecewise-smooth, so FD at any eps
    # crosses wrap boundaries (measured: FD never converges while
    # jvp == vjp to 5 digits).
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    d = d / jnp.sqrt(jnp.sum(d * d))
    analytic = float(jnp.sum(g * d))
    fwd = float(jax.jvp(loss, (x,), (d,))[1])
    # f32 tolerance: jvp and vjp accumulate rounding in different orders
    # through the FFT/wrap pipeline (measured 0.15% after the grad-safe
    # polar guards reshuffled the fusion; 0.05% before)
    assert abs(fwd - analytic) < 3e-3 * max(abs(analytic), 1.0)


def test_grad_through_pv_forward_magnitudes():
    from flan_tpu.ops import stft
    x = _sine()

    def loss(v):
        mag, _ = stft.pv_forward(v, window_size=512, hop=64, dft_size=512,
                                 sample_rate=SR)
        # bins around the 440 Hz peak (bin ~28): mag is large there, so
        # sqrt is smooth and a finite difference is meaningful (near-zero
        # bins sit on the |.| cone where FD and the a.e. gradient differ)
        return jnp.sum(mag[:, :, 24:33])

    g = jax.grad(loss)(x)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0
    # magnitudes are smooth in the input (no phase wraps), so a
    # directional finite difference must match the analytic gradient
    rng = np.random.default_rng(1)
    d = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    d = d / jnp.sqrt(jnp.sum(d * d))
    eps = 1e-2
    fd = float((loss(x + eps * d) - loss(x - eps * d)) / (2 * eps))
    analytic = float(jnp.sum(g * d))
    assert abs(fd - analytic) < 0.02 * max(abs(analytic), 1.0)


def test_grad_through_spv_roundtrip():
    """The sliding-DFT PV is differentiable end to end (impossible in the
    C++ reference): d(sum of reconstruction)/d(input) exists and is
    finite through the chunked scans, atan2 phase extraction and mod-1
    accumulators."""
    import jax
    import jax.numpy as jnp
    from flan_tpu.spv.spv import spv_forward, spv_inverse

    sr = 8000.0
    n = 1024
    t = np.arange(n, dtype=np.float32) / sr
    x = jnp.asarray((0.4 * np.sin(2 * np.pi * 440.0 * t))[None])

    def loss(v):
        mag, freq = spv_forward(v, 64, sr)
        y = spv_inverse(mag, freq, sr)
        return jnp.sum(y[:, 256:-256] ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0.0


def test_grad_through_iir_filter_scan():
    """The TPT/SVF filters run as associative matrix-affine scans
    (flan_tpu/ops/scan.py) - gradients flow through the scan combiner
    AND through the cutoff parameter (the C++ per-sample recurrence has
    neither path)."""
    from flan_tpu.audio import Audio
    x = _sine()

    def loss_sig(v):
        a = Audio.create_from_array(v, SR)
        return jnp.sum(a.filter_2pole_lowpass(800.0, 0.7).data ** 2)

    g = jax.grad(loss_sig)(x)
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0

    a = Audio.create_from_array(x, SR)

    def loss_cut(c):
        return jnp.sum(a.filter_2pole_lowpass(c, 0.7).data ** 2)

    gc = jax.grad(loss_cut)(jnp.float32(800.0))
    assert np.isfinite(float(gc))
    # energy of a 440 Hz tone through a lowpass grows with cutoff
    assert float(gc) > 0
    # smooth in the cutoff: finite difference agrees
    eps = 1.0
    fd = (float(loss_cut(jnp.float32(800.0 + eps)))
          - float(loss_cut(jnp.float32(800.0 - eps)))) / (2 * eps)
    assert abs(fd - float(gc)) < 0.02 * max(abs(float(gc)), 1.0)


def test_grad_through_polyphase_resampler():
    from flan_tpu.ops.resample import resample
    x = _sine()

    def loss(v):
        return jnp.sum(resample(v, SR, 12000.0) ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())
    # resampling is linear: the gradient at 2x equals 2 * grad at x
    g2 = jax.grad(loss)(2.0 * x)
    np.testing.assert_allclose(np.asarray(g2), 2 * np.asarray(g),
                               rtol=2e-4, atol=1e-6)


def test_grad_through_compressor_max_affine_scan():
    """The compressor's peak detector is a max-affine parallel scan;
    max has an a.e.-defined subgradient, so grads stay finite."""
    from flan_tpu.audio import Audio
    x = _sine()

    def loss(v):
        a = Audio.create_from_array(v, SR)
        return jnp.sum(a.compress(-20.0, ratio=4.0).data ** 2)

    g = jax.grad(loss)(x)
    assert g.shape == x.shape and bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_grad_in_algorithm_parameter_2d():
    """Traced scalars route down Function2d's sampled path too:
    d(energy)/d(decay) through PV.resonate's max-affine scan."""
    from flan_tpu import Audio
    x = _sine()
    pv = Audio.create_from_array(x, SR).convert_to_PV(512, 64, 512)

    def loss(d):
        return jnp.sum(pv.resonate(0.1, d).mag ** 2)

    val, g = jax.value_and_grad(loss)(jnp.float32(0.05))
    assert np.isfinite(float(g))
    # the traced-parameter run (val) must match the constant-param run
    const = float(loss(0.05))
    assert abs(float(val) - const) <= 1e-5 * max(abs(const), 1.0)


def test_jit_with_traced_parameter_matches_eager_constant():
    """Users can jit library calls with the parameter as an ARGUMENT
    (re-running different cutoffs without retracing): the traced scalar
    takes the sampled path and must match the eager constant run."""
    from flan_tpu.audio import Audio
    x = _sine()
    a = Audio.create_from_array(x, SR)

    fj = jax.jit(lambda c: a.filter_2pole_lowpass(c, 0.7).data)
    eager = np.asarray(a.filter_2pole_lowpass(800.0, 0.7).data)
    np.testing.assert_allclose(np.asarray(fj(jnp.float32(800.0))), eager,
                               atol=2e-5)
    # second cutoff reuses the compiled program (no retrace crash)
    out2 = np.asarray(fj(jnp.float32(1600.0)))
    assert not np.allclose(out2, eager)
