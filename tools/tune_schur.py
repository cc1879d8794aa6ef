#!/usr/bin/env python
"""Sweep the Schur multishift knobs (NB bulges, SW AED window, nibble)
on the live accelerator and report wall time per config.

The knobs are read from env at import (la/schur.py), so each config
runs in its own subprocess — also the honest way to time on the
single-tenant TPU (one process at a time; see memory/CLAUDE.md).

Usage:  python tools/tune_schur.py [N ...]     (default: 512 1024)
Prints one JSON line per config and a ranked summary.
"""
import itertools
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))) if "__file__" in dir() else ".")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.getcwd(), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
from nd4js_tpu import la

n = int(os.environ["TUNE_N"])
key = jax.random.PRNGKey(8)
a = jax.random.normal(key, (n, n), jnp.float32)

# force through a host transfer: block_until_ready does NOT
# synchronize through the axon relay (measured 37 us "wall" for a
# 1024^2 schur) — float() is the only honest fence here
def _run(a):
    q, t = la.schur_decomp(a)
    return q, t, jnp.abs(q).max() + jnp.abs(t).max()

f = jax.jit(_run)
q, t, anchor = f(a)
float(anchor)
_nf = jax.jit(lambda x: x[0, 0] * 2)
float(_nf(a))
floor = min((lambda t0: (float(_nf(a)), time.perf_counter() - t0)[1])(
    time.perf_counter()) for _ in range(3))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    q, t, anchor = f(a)
    float(anchor)
    best = min(best, time.perf_counter() - t0)
best = max(best - floor, 1e-9)
rec = jnp.matmul(jnp.matmul(q, t, precision="highest"),
                 jnp.swapaxes(q, -1, -2), precision="highest") - a
resid = float(jnp.abs(rec).max())
ok = resid <= 16 * float(jnp.finfo(jnp.float32).eps) * n \
    * float(jnp.abs(a).max())
print(json.dumps({"n": n, "sec": best, "resid": resid, "ok": ok,
                  "NB": os.environ.get("ND4JS_TPU_SCHUR_NB"),
                  "SW": os.environ.get("ND4JS_TPU_SCHUR_SW"),
                  "NIB": os.environ.get("ND4JS_TPU_SCHUR_NIBBLE"),
                  "W": os.environ.get("ND4JS_TPU_SCHUR_W")}))
"""


def main():
    sizes = [int(x) for x in sys.argv[1:]] or [512, 1024]
    # grid entries: (NB, SW, NIBBLE, W). The dominant wall-clock term
    # is (position steps per sweep) × (per-step kernel latency) ×
    # (sweeps ≈ n/2NB) — more shifts with a BIGGER chase window W cuts
    # sweeps without inflating slide count (measured: NB=16 at W=128
    # LOSES because SL = W − 3NB shrinks; see BENCH notes r3)
    grid = [(8, 24, 4, 128), (16, 48, 4, 192), (16, 48, 4, 256),
            (24, 72, 4, 256), (24, 96, 4, 256), (32, 96, 4, 256),
            (16, 48, 4, 128), (24, 72, 4, 192)]
    if os.environ.get("TUNE_GRID") == "small":
        grid = [(8, 24, 4, 128), (8, 32, 4, 128), (8, 48, 4, 128),
                (12, 32, 4, 128), (12, 48, 4, 128), (16, 48, 4, 128),
                (8, 24, 2, 128), (8, 32, 8, 128)]
    results = []
    for n, (nb, sw, nib, w) in itertools.product(sizes, grid):
        env = dict(os.environ,
                   ND4JS_TPU_SCHUR_NB=str(nb),
                   ND4JS_TPU_SCHUR_SW=str(sw),
                   ND4JS_TPU_SCHUR_NIBBLE=str(nib),
                   ND4JS_TPU_SCHUR_W=str(w),
                   TUNE_N=str(n))
        p = subprocess.run([sys.executable, "-c", _CHILD], env=env,
                           capture_output=True, text=True, timeout=1800,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() \
            else ""
        try:
            r = json.loads(line)
        except Exception:
            r = {"n": n, "NB": nb, "SW": sw, "NIB": nib, "ok": False,
                 "err": (p.stderr or "")[-400:]}
        print(json.dumps(r), flush=True)
        results.append(r)
    good = [r for r in results if r.get("ok")]
    for n in sizes:
        rows = sorted((r for r in good if r["n"] == n),
                      key=lambda r: r["sec"])
        if rows:
            b = rows[0]
            print(f"# best n={n}: NB={b['NB']} SW={b['SW']} "
                  f"NIB={b['NIB']} W={b.get('W')}  {b['sec']*1e3:.1f} ms")


if __name__ == "__main__":
    main()
