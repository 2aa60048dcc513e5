#!/bin/bash
# Round-3 second TPU session: re-measure LASSO with the adaptive-rho
# ladder, the dispatch-free roofline, the kernel phase profile, and the
# fused-PD convergence trace.  Each step is its own crash domain.
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/ip_tpu_jax_cache

echo "=== lasso re-measure $(date)"
timeout 3600 python -u - <<'EOF'
import json, time, numpy as np, jax, os
jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/ip_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import sys; sys.path.insert(0, "/root/repo")
import bench
print("devices:", jax.devices(), flush=True)
t0 = time.time(); np.asarray(jax.numpy.ones(8) * 2.0)
print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
for n, reps in [(1000, 3), (2000, 3), (5000, 2)]:
    t0 = time.time()
    try:
        mean_s, times, val, note = bench.bench_lasso(n, reps, "float64")
    except Exception as e:
        print(f"# lasso n={n} FAILED: {e!r}", flush=True); continue
    baseline = bench.BASELINES["lasso"].get(n)
    print(f"# lasso n={n}: wall {time.time()-t0:.0f}s obj {val:.8f} times "
          f"{['%.3f' % t for t in times]}", flush=True)
    print(json.dumps({"metric": f"lasso_n{n}_solve_seconds",
                      "value": round(mean_s, 4), "unit": "s",
                      "vs_baseline": round(baseline / mean_s, 3)}),
          flush=True)
for suite, n in [("lp", 1000), ("lp", 3000), ("lp", 5000), ("qp", 1000)]:
    t0 = time.time()
    try:
        res = bench.roofline(suite, n, 30, "float64")
    except Exception as e:
        print(f"# roofline {suite} n={n} FAILED: {e!r}", flush=True)
        continue
    print(f"# roofline {suite} n={n}: k={res['k']} r={res['r']} "
          f"mode={res['mode']} {res['step_ms']:.2f} ms/step", flush=True)
    print(json.dumps({"metric": f"{suite}_n{n}_fused_step_tflops",
                      "value": round(res["achieved_tflops"], 3),
                      "unit": "TFLOP/s",
                      "vs_baseline": round(res["frac_f32_eff_peak"], 4)}),
          flush=True)
EOF
echo "=== lasso/roofline exit=$? $(date)"

echo "=== kernel profile $(date)"
timeout 3600 python -u scripts/tpu_kernel_profile.py
echo "=== kernel profile exit=$? $(date)"

echo "=== pd debug qp 1000 $(date)"
timeout 2700 python -u scripts/tpu_pd_debug.py qp 1000
echo "=== pd debug exit=$? $(date)"
echo "=== round3b done $(date)"
