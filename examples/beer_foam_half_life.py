"""Beer-foam half-life fit — port of the reference's flagship example
(/root/reference/examples/beer_foam_half_life.html): fit an exponential
decay to the classic Leike (2002) Erdinger beer-foam measurements with
the trust-region Levenberg-Marquardt generator, stopping when the
gradient is flat (the user owns convergence — the reference idiom at
beer_foam_half_life.html:44-46).

Run: python examples/beer_foam_half_life.py
"""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

import nd4js_tpu as nd

# beer-froth decay: time [s] vs froth height [cm] (Leike-2002-style data)
T = jnp.asarray([0., 15., 30., 45., 60., 75., 90., 105., 120.,
                 150., 180., 210., 240., 300., 360.])
H = jnp.asarray([17.0, 16.1, 14.9, 14.0, 13.2, 12.5, 11.9, 11.2, 10.7,
                 9.7, 8.9, 8.3, 7.5, 6.3, 5.2])


def model(p, t):
    return p[0] * jnp.exp(-t / p[1])


def main():
    p = jnp.asarray([16.0, 100.0])
    mse = jnp.inf
    try:
        for i, (p, mse, grad) in enumerate(
                nd.opt.fit_lm_gen(T, H, model, p)):
            if float(jnp.max(jnp.abs(grad))) < 1e-7 or i > 100:
                break
    except nd.opt.OptimizationNoProgressError as e:
        # converged to the measurement-noise floor — the reference
        # throws here too; the last yielded point is the fit
        pass
    h0, tau = float(p[0]), float(p[1])
    print(f"fit:       h(t) = {h0:.3f} cm · exp(−t / {tau:.1f} s)")
    print(f"half-life: {tau * math.log(2):.1f} s  ")
    print(f"rms error: {math.sqrt(float(mse)):.3f} cm")


if __name__ == "__main__":
    main()
