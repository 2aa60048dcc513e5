"""Round-5d2: the XL-regime roofline rows, after the closure-constant
fix in bench.py (_chain_time): jitted roofline chains used to CLOSE
OVER the problem constants, baking 100-360 MB of arrays into the
serialized program and blowing the tunnel's remote-compile body cap
(HTTP 413) at exactly the XL shapes.  With operands passed as jit
arguments the program is small; this records the production path's
efficiency at SOCP n=3000/5000 and LP n=10000 (VERDICT r4 item 3).

    timeout 10000 python scripts/tpu_round5d2.py 2>&1 | tee benchmarks/results/round5d2_raw.log
"""
import gc
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/ip_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

CASES = [
    ("socp", 3000, 8),
    ("lp", 10000, 8),
    ("socp", 5000, 4),
]


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    for attempt in range(6):
        try:
            np.asarray(jnp.ones(8) * 2.0)
            break
        except Exception as e:
            print(f"d2h warm attempt {attempt} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            time.sleep(60)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    print(f"# RTT: {bench.tunnel_rtt()*1e3:.2f} ms", flush=True)

    for suite, n, reps in CASES:
        t0 = time.time()
        try:
            res = bench.roofline(suite, n, reps, "float64")
            print(f"# roofline {suite} n={n}: k={res['k']} r={res['r']} "
                  f"mode={res['mode']} {res['step_ms']:.3f} ms/step "
                  f"{res['achieved_tflops']:.3f} TFLOP/s "
                  f"({100*res['frac_f32_eff_peak']:.1f}% f32-eff peak)"
                  f" wall {time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# roofline {suite} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)
        gc.collect()
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main()
