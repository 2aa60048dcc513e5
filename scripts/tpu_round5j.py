"""Round-5j: final roofline record at HEAD with rep counts sized so the
chain signal dominates the tunnel-RTT subtraction (the n=1000 rows'
earlier 40-step chains carried only ~4 ms of signal against a ~24 ms
RTT — ±3 ms tunnel jitter was ±75 us/step of pure noise, which is why
round5d/g/h/i's n=1000 step numbers bounced 0.085-0.234 ms).

    timeout 9000 python scripts/tpu_round5j.py 2>&1 | tee benchmarks/results/round5j_raw.log
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
    ("lp", 1000, 600),
    ("qp", 1000, 600),
    ("lp", 5000, 100),
    ("socp", 1000, 40),
    ("lp-pd", 1000, 200),
    ("qp-pd", 1000, 100),
    ("socp-kkt", 1000, 100),
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
            hr = res.get("ns_hit_rate")
            print(f"# roofline {suite} n={n} reps={reps}: k={res['k']} "
                  f"r={res['r']} mode={res['mode']} "
                  f"{res['step_ms']:.3f} ms/step "
                  f"{res['achieved_tflops']:.3f} TFLOP/s "
                  f"({100*res['frac_f32_eff_peak']:.1f}% f32-eff peak)"
                  + (f" ns_hit_rate={hr:.2f}" if hr is not None else "")
                  + f" wall {time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# roofline {suite} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)
        gc.collect()
        if n >= 3000:
            jax.clear_caches()
            gc.collect()


if __name__ == "__main__":
    main()
