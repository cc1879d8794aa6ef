#!/usr/bin/env python
"""Benchmark: batched 512×512 decompositions on the local accelerator.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Mirrors the reference benchmark harnesses' in-loop correctness checks
(/root/reference/benchmarks/bench_la_decomps.html:72-88): a run whose
reconstruction residual exceeds 1e-5·‖A‖·√N scores zero.

Timing is amortised *in-graph* (a lax.scan chain of the op inside one
jit call): this host reaches the TPU through a relay with a ~37 ms
round-trip, which would otherwise swamp sub-ms kernels. The measured
null round-trip is subtracted.

vs_baseline: achieved f32 GFLOP/s over the decomposition suite divided
by (0.70 × the chip's f32 MXU roofline) — BASELINE.md's target is ≥70%
of roofline, so vs_baseline ≥ 1.0 meets the target. f32-full matmuls on
TPU run multi-pass on the bf16 MXU; the f32 roofline is peak_bf16/2
(matches the measured 95.7 TFLOP/s f32 GEMM peak on v5e).
"""
import json
import time

import jax
import jax.numpy as jnp

from nd4js_tpu import la

N = 512
BATCH = 32

_PEAK_BF16_TFLOPS = {
    "v4": 275.0,
    "v5 lite": 197.0, "v5e": 197.0,
    "v5p": 459.0, "v5": 459.0,
    "v6 lite": 918.0, "v6e": 918.0,
}


def _roofline_f32_gflops():
    kind = jax.devices()[0].device_kind.lower()
    for key, tf in _PEAK_BF16_TFLOPS.items():
        if key in kind:
            return tf / 2.0 * 1e3
    return 197.0 / 2.0 * 1e3


def _null_roundtrip(x):
    f = jax.jit(lambda x: x[0, 0, 0] * 2)
    float(f(x))
    t = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(x))
        t.append(time.perf_counter() - t0)
    return min(t)


def _amortized(f, x, iters=10, floor=0.0):
    """Time f via an in-graph dependent chain; subtract round-trip."""
    def run(x):
        def body(c, _):
            out = f(c)
            leaves = jax.tree_util.tree_leaves(out)
            return c + 0.0 * leaves[0].astype(c.dtype).sum(), None
        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.abs(out).max()
    g = jax.jit(run)
    float(g(x))  # compile
    t0 = time.perf_counter()
    float(g(x))
    return max((time.perf_counter() - t0 - floor) / iters, 1e-9)


def main():
    key = jax.random.PRNGKey(42)
    a = jax.random.normal(key, (BATCH, N, N), jnp.float32)
    anorm = float(jnp.abs(a).max())
    tol = 1e-5 * anorm * N ** 0.5
    floor = _null_roundtrip(a)

    results = {}

    # --- QR (factor + explicit economic Q): 8/3 N^3 flops/matrix -----
    qr = lambda x: la.qr_decomp(x, method="cholqr2")
    t = _amortized(qr, a, floor=floor)
    q, r = jax.jit(qr)(a)
    recon = float(jnp.abs(jnp.matmul(q, r, precision="highest") - a).max())
    results["qr"] = {"sec": t, "ok": recon <= tol,
                     "flops": 8 / 3 * N ** 3 * BATCH, "recon": recon}

    # --- LU partial pivot: 2/3 N^3 flops/matrix ----------------------
    lu_op = lambda x: la.lu_decomp(x)
    t = _amortized(lu_op, a, floor=floor)
    lu, p = jax.jit(lu_op)(a)
    L = jnp.tril(lu, -1) + jnp.eye(N, dtype=lu.dtype)
    U = jnp.triu(lu)
    ap = jnp.take_along_axis(a, p[..., None], axis=-2)
    recon = float(jnp.abs(jnp.matmul(L, U, precision="highest") - ap).max())
    results["lu"] = {"sec": t, "ok": recon <= tol,
                     "flops": 2 / 3 * N ** 3 * BATCH, "recon": recon}

    # --- Cholesky (SPD): 1/3 N^3 flops/matrix -------------------------
    spd = jnp.matmul(a, jnp.swapaxes(a, -1, -2),
                     precision="highest") / N + 2 * jnp.eye(N)
    chol_op = lambda x: la.cholesky_decomp(x)
    t = _amortized(chol_op, spd, floor=floor)
    L = jax.jit(chol_op)(spd)
    recon = float(jnp.abs(jnp.matmul(
        L, jnp.swapaxes(L, -1, -2), precision="highest") - spd).max())
    results["chol"] = {"sec": t, "ok": recon <= 1e-5 * float(
        jnp.abs(spd).max()) * N ** 0.5,
        "flops": 1 / 3 * N ** 3 * BATCH, "recon": recon}

    # --- SVD (one-sided Jacobi) when available -----------------------
    if hasattr(la, "svd_decomp"):
        try:
            svd_op = lambda x: la.svd_decomp(x)
            t = _amortized(svd_op, a, iters=4, floor=floor)
            u, sv, v = jax.jit(svd_op)(a)
            rec = jnp.matmul(u * sv[..., None, :], v, precision="highest")
            recon = float(jnp.abs(rec - a).max())
            results["svd"] = {"sec": t, "ok": recon <= tol,
                              "flops": 14 * N ** 3 * BATCH, "recon": recon}
        except Exception:
            pass

    roofline = _roofline_f32_gflops()
    per_op = {}
    for name, r in results.items():
        g = (r["flops"] / r["sec"] / 1e9) if r["ok"] else 0.0
        per_op[name] = {"gflops": g, "mat_s": BATCH / r["sec"],
                        "frac": g / roofline, "ok": r["ok"]}
    # geometric mean of per-op roofline fractions (each op weighted
    # equally — a total-time aggregate would just measure the slowest)
    import math
    fracs = [max(v["frac"], 1e-9) for v in per_op.values()]
    geo = math.exp(sum(math.log(f) for f in fracs) / len(fracs))
    gflops_geo = geo * roofline
    detail = "; ".join(
        f"{k}={v['mat_s']:.0f}/s({v['gflops']:.0f}GF)"
        for k, v in per_op.items())
    print(json.dumps({
        "metric": f"batched {N}x{N} f32 decomp suite, geomean GFLOP/s "
                  f"over {{{', '.join(per_op)}}} [{detail}] "
                  f"roofline_frac={geo:.4f}",
        "value": round(gflops_geo, 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(geo / 0.70, 4),
    }))


if __name__ == "__main__":
    main()
