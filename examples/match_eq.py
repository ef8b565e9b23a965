"""Differentiable EQ matching - impossible in the C++ reference.

Recovers an unknown lowpass cutoff by gradient descent: a traced scalar
passed where the reference takes a Function routes down the sampled
path (flan_tpu/func/function.py), so the whole filter - a 2x2
matrix-affine associative scan on device - is differentiable in its
cutoff. The loss is the L2 distance between log-magnitude spectra.

Run: python examples/match_eq.py [--steps N] [--seconds S] [--sr SR]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--seconds", type=float, default=0.5)
    p.add_argument("--sr", type=float, default=8000.0)
    p.add_argument("--true-cutoff", type=float, default=900.0)
    p.add_argument("--init-cutoff", type=float, default=2500.0)
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    from flan_tpu import Audio

    rng = np.random.default_rng(0)
    n = int(args.seconds * args.sr)
    x = Audio.create_from_array(
        rng.standard_normal((1, n)).astype(np.float32) * 0.3, args.sr)

    target = jnp.log1p(jnp.abs(jnp.fft.rfft(
        x.filter_2pole_lowpass(args.true_cutoff, 0.7).data, axis=-1)))

    def loss(log_cutoff):
        y = x.filter_2pole_lowpass(jnp.exp(log_cutoff), 0.7).data
        spec = jnp.log1p(jnp.abs(jnp.fft.rfft(y, axis=-1)))
        return jnp.mean((spec - target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss))
    params = jnp.log(jnp.float32(args.init_cutoff))
    opt = optax.adam(5e-2)
    state = opt.init(params)
    for i in range(args.steps):
        val, g = grad_fn(params)
        updates, state = opt.update(g, state)
        params = optax.apply_updates(params, updates)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(val):.6f}  "
                  f"cutoff {float(jnp.exp(params)):8.1f} Hz")

    found = float(jnp.exp(params))
    print(f"true cutoff {args.true_cutoff:.1f} Hz, recovered {found:.1f} Hz")
    return found


if __name__ == "__main__":
    main()
