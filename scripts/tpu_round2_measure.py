"""Round-2 measurement campaign: one process, one first-d2h stall.

Chains the bench.py suite recipes at the sizes the round-2 kernels
target (fused SOCP kernel at n=1000/3000, HBM-streaming LP/QP at
n=5000) and prints one JSON line per point.  Run on the real chip:

    PYTHONPATH=/root/repo python scripts/tpu_round2_measure.py [quick]

`quick` measures only socp@1000 + lp@5000 (the two headline deltas).
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

QUICK = len(sys.argv) > 1 and sys.argv[1] == "quick"

POINTS = ([("socp", 1000, 3), ("lp", 5000, 2)] if QUICK else
          [("socp", 1000, 3), ("socp", 3000, 2),
           ("lp", 3000, 3), ("lp", 5000, 2), ("qp", 5000, 2),
           ("lasso", 5000, 2)])

FNS = {"lp": bench.bench_lp, "qp": bench.bench_qp,
       "socp": bench.bench_socp, "lasso": bench.bench_lasso}


def main():
    print("devices:", jax.devices(), flush=True)
    # absorb the first-d2h stall on a trivial transfer, not a benchmark
    t0 = time.time()
    np.asarray(jax.numpy.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)

    for suite, n, reps in POINTS:
        t0 = time.time()
        try:
            mean_s, times, val, note = FNS[suite](n, reps, "float64")
        except Exception as e:
            print(f"# {suite} n={n} FAILED after {time.time()-t0:.0f}s: "
                  f"{e!r}", flush=True)
            continue
        baseline = bench.BASELINES[suite].get(n)
        print(f"# {suite} n={n}: wall {time.time()-t0:.0f}s "
              f"obj {val:.8f} {note} times "
              f"{['%.3f' % t for t in times]}", flush=True)
        print(json.dumps({
            "metric": f"{suite}_n{n}_solve_seconds",
            "value": round(mean_s, 4), "unit": "s",
            "vs_baseline": (round(baseline / mean_s, 3)
                            if baseline else None)}), flush=True)

    # primal-dual Mehrotra engine (ops/pd.py) at the headline shapes —
    # expected to dominate at large n where the barrier runs staged
    for suite, n, reps in ([] if QUICK else
                           [("lp", 1000, 3), ("lp", 5000, 2),
                            ("qp", 1000, 3), ("qp", 5000, 2),
                            ("socp", 1000, 2)]):
        t0 = time.time()
        try:
            mean_s, times, val, note = FNS[suite](n, reps, "float64",
                                                  algorithm="pd")
        except Exception as e:
            print(f"# {suite}-pd n={n} FAILED after {time.time()-t0:.0f}s: "
                  f"{e!r}", flush=True)
            continue
        baseline = bench.BASELINES[suite].get(n)
        print(f"# {suite}-pd n={n}: wall {time.time()-t0:.0f}s "
              f"obj {val:.8f} {note} times "
              f"{['%.3f' % t for t in times]}", flush=True)
        print(json.dumps({
            "metric": f"{suite}_n{n}_pd_solve_seconds",
            "value": round(mean_s, 4), "unit": "s",
            "vs_baseline": (round(baseline / mean_s, 3)
                            if baseline else None)}), flush=True)

    # roofline: achieved fused-step FLOP/s vs v5e peak (BASELINE.md:89)
    for suite, n in ([] if QUICK else
                     [("lp", 1000), ("lp", 3000), ("lp", 5000),
                      ("qp", 1000)]):
        t0 = time.time()
        try:
            res = bench.roofline(suite, n, 10, "float64")
        except Exception as e:
            print(f"# roofline {suite} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {e!r}", flush=True)
            continue
        print(f"# roofline {suite} n={n}: k={res['k']} r={res['r']} "
              f"mode={res['mode']} {res['step_ms']:.2f} ms/step", flush=True)
        print(json.dumps({
            "metric": f"{suite}_n{n}_fused_step_tflops",
            "value": round(res["achieved_tflops"], 3), "unit": "TFLOP/s",
            "vs_baseline": round(res["frac_f32_eff_peak"], 4)}),
            flush=True)


if __name__ == "__main__":
    main()
