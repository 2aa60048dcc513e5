"""Round-5g: the block-LDL/Newton-Schulz factor on hardware.

The LP/QP step kernels' blocked Cholesky carried a 71 us/tile
sequential pivot chain (8 tiles at rp=1024 = 569 us of the 1.86 ms
n=5000 streaming step).  The replacement factors Hs = L~ D L~^T with
per-tile NS inverses — every op an MXU matmul.  This measures the
rooflines and solve surfaces that the change targets, plus a clean
re-run of the n=1000 solve rows (the earlier bench preview was
contaminated by a duplicate process).

    timeout 9000 python scripts/tpu_round5g.py 2>&1 | tee benchmarks/results/round5g_raw.log
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
            print(f"d2h warm attempt {attempt} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            time.sleep(60)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    print(f"# RTT: {bench.tunnel_rtt()*1e3:.2f} ms", flush=True)

    for suite, n, reps in [("lp", 1000, 40), ("qp", 1000, 40),
                           ("lp", 5000, 20)]:
        t0 = time.time()
        try:
            res = bench.roofline(suite, n, reps, "float64")
            hr = res.get("ns_hit_rate")
            print(f"# roofline {suite} n={n}: k={res['k']} r={res['r']} "
                  f"mode={res['mode']} {res['step_ms']:.3f} ms/step "
                  f"{res['achieved_tflops']:.3f} TFLOP/s "
                  f"({100*res['frac_f32_eff_peak']:.1f}% f32-eff peak)"
                  + (f" ns_hit_rate={hr:.2f}" if hr is not None else "")
                  + f" wall {time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# roofline {suite} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:400]}", flush=True)
        hygiene()

    for tag, fn, n, reps in [("lp1000", bench.bench_lp, 1000, 3),
                             ("qp1000", bench.bench_qp, 1000, 3),
                             ("lasso1000", bench.bench_lasso, 1000, 3),
                             ("lp5000", bench.bench_lp, 5000, 2)]:
        t0 = time.time()
        try:
            mean_s, times, val, note, raw = fn(n, reps, "float64")
            print(f"# {tag}: {mean_s:.4f}s raw={['%.3f' % t for t in raw]}"
                  f" obj {val:.8f} {note} wall {time.time()-t0:.0f}s",
                  flush=True)
        except Exception as e:
            print(f"# {tag} FAILED after {time.time()-t0:.0f}s: "
                  f"{type(e).__name__}: {str(e)[:400]}", flush=True)
        if n >= 3000:
            hygiene()


if __name__ == "__main__":
    main()
