"""Round-4b probe: effect of the ε-gated dd-PCG escalation + the
fused-pass/early-exit/stored-sweep kernel changes on the flagship rows.

    PYTHONPATH=/root/repo timeout 7200 python scripts/tpu_round4b.py
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/ip_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

FNS = {"lp": bench.bench_lp, "qp": bench.bench_qp,
       "socp": bench.bench_socp, "lasso": bench.bench_lasso}

POINTS = [
    ("lp", 1000, 3, "barrier"),    # target: back to <= 0.06 s
    ("qp", 1000, 3, "barrier"),    # target: back to <= 0.06 s
    ("lp", 1000, 3, "pd"),
    ("socp", 1000, 2, "pd"),       # with the eps-gated Schur-CG tols
]

ROOFLINES = [("lp", 1000), ("lp", 5000), ("qp", 1000),
             ("lp-pd", 1000), ("qp-pd", 1000), ("socp", 1000),
             ("socp-kkt", 1000)]


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jax.numpy.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)

    for suite, n, reps, algo in POINTS:
        t0 = time.time()
        kw = {} if algo == "barrier" else {"algorithm": algo}
        tag = "" if algo == "barrier" else f"_{algo}"
        try:
            mean_s, times, val, note = FNS[suite](n, reps, "float64", **kw)
        except Exception as e:
            print(f"# {suite}{tag} n={n} FAILED after {time.time()-t0:.0f}s:"
                  f" {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        baseline = bench.BASELINES[suite].get(n)
        print(f"# {suite}{tag} n={n}: wall {time.time()-t0:.0f}s "
              f"obj {val:.8f} {note} times "
              f"{['%.3f' % t for t in times]}", flush=True)
        print(json.dumps({
            "metric": f"{suite}_n{n}{tag}_solve_seconds",
            "value": round(mean_s, 4), "unit": "s",
            "vs_baseline": (round(baseline / mean_s, 3)
                            if baseline else None)}), flush=True)

    for suite, n in ROOFLINES:
        t0 = time.time()
        try:
            res = bench.roofline(suite, n, 30, "float64")
        except Exception as e:
            print(f"# roofline {suite} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"# roofline {suite} n={n}: k={res['k']} r={res['r']} "
              f"mode={res['mode']} {res['step_ms']:.2f} ms/step "
              f"({res['frac_f32_eff_peak']*100:.1f}% f32-eff peak)",
              flush=True)
        print(json.dumps({
            "metric": f"{suite}_n{n}_fused_step_tflops",
            "value": round(res["achieved_tflops"], 3), "unit": "TFLOP/s",
            "vs_baseline": round(res["frac_f32_eff_peak"], 4)}),
            flush=True)


if __name__ == "__main__":
    main()
