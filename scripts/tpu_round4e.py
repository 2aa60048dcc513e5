"""Round-4e: roofline record at HEAD (production stall gates,
RTT-adjusted) for the round log — all fused kernels + the XL shapes.

    timeout 10000 python scripts/tpu_round4e.py
"""
import json
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


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    print(f"# RTT: {bench.tunnel_rtt()*1e3:.2f} ms", flush=True)

    for suite, n, reps in [("lp", 1000, 60), ("qp", 1000, 60),
                           ("lp", 5000, 30), ("socp", 1000, 30),
                           ("socp", 3000, 20),
                           ("lp-pd", 1000, 30), ("qp-pd", 1000, 30),
                           ("socp-kkt", 1000, 30)]:
        t0 = time.time()
        try:
            res = bench.roofline(suite, n, reps, "float64")
        except Exception as e:
            print(f"# roofline {suite} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)
            continue
        print(f"# roofline {suite} n={n}: k={res['k']} r={res['r']} "
              f"mode={res['mode']} {res['step_ms']:.3f} ms/step "
              f"({res['frac_f32_eff_peak']*100:.1f}% f32-eff peak)",
              flush=True)
        print(json.dumps({
            "metric": f"{suite}_n{n}_fused_step_tflops",
            "value": round(res["achieved_tflops"], 3), "unit": "TFLOP/s",
            "vs_baseline": round(res["frac_f32_eff_peak"], 4)}),
            flush=True)


if __name__ == "__main__":
    main()
