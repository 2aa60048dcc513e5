"""Round-3 measurement addendum to scripts/tpu_round2_measure.py.

Fills the points the round-2 campaign list missed:

- n=2000 rows for every suite (T4 baseline rows exist for all four);
- SOCP at n=5000 (barrier, reps=1 — XLA mixed path, slow but recorded);
- conic Mehrotra at n=3000/5000 (``algorithm="pd"`` — the production
  choice where the fused SOCP barrier kernel's rp<=1536 envelope ends);
- QP roofline at n=5000 (the streaming-kernel QP regime).

Run on the real chip:  PYTHONPATH=/root/repo python scripts/tpu_round3_measure.py
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
    ("lp", 2000, 3, "barrier"),
    ("qp", 2000, 3, "barrier"),
    ("lasso", 2000, 3, None),
    ("socp", 3000, 2, "pd"),
    ("socp", 5000, 1, "pd"),
    ("socp", 5000, 1, "barrier"),
]


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jax.numpy.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)

    for suite, n, reps, algo in POINTS:
        t0 = time.time()
        kw = {} if algo is None else {"algorithm": algo}
        tag = "" if algo in (None, "barrier") else f"_{algo}"
        try:
            mean_s, times, val, note = FNS[suite](n, reps, "float64", **kw)
        except Exception as e:
            print(f"# {suite}{tag} n={n} FAILED after {time.time()-t0:.0f}s:"
                  f" {e!r}", flush=True)
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

    for suite, n in [("qp", 5000)]:
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
