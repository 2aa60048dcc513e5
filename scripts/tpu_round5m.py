"""Round-5m: the 3-pass (bf16x3) preconditioner Gram in the XL step —
does it buy the SOCP n=3000 <= 1 s bar (VERDICT r4 item 7)?

    timeout 9000 python scripts/tpu_round5m.py 2>&1 | tee benchmarks/results/round5m_raw.log
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


def hygiene():
    gc.collect()
    jax.clear_caches()
    gc.collect()


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    for attempt in range(6):
        try:
            np.asarray(jnp.ones(8) * 2.0)
            break
        except Exception as e:
            print(f"warm fail {attempt}: {type(e).__name__}", flush=True)
            time.sleep(60)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    print(f"# RTT: {bench.tunnel_rtt()*1e3:.2f} ms", flush=True)

    for suite, n, reps in [("socp", 3000, 10), ("lp", 10000, 8),
                           ("socp", 5000, 4)]:
        t0 = time.time()
        try:
            res = bench.roofline(suite, n, reps, "float64")
            print(f"# roofline {suite} n={n}: mode={res['mode']} "
                  f"{res['step_ms']:.3f} ms/step "
                  f"{res['achieved_tflops']:.3f} TFLOP/s "
                  f"({100*res['frac_f32_eff_peak']:.1f}% f32-eff peak)"
                  f" wall {time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# roofline {suite} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
        hygiene()

    for tag, n, reps in [("socp3000_barrier", 3000, 2),
                         ("socp1000_barrier", 1000, 2)]:
        t0 = time.time()
        try:
            mean_s, times, val, note, raw = bench.bench_socp(
                n, reps, "float64")
            print(f"# {tag}: {mean_s:.4f}s "
                  f"raw={['%.3f' % t for t in raw]} obj {val:.8f} "
                  f"wall {time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# {tag} FAILED after {time.time()-t0:.0f}s: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        hygiene()


if __name__ == "__main__":
    main()
