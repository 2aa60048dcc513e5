"""Round-4a HEAD validation batch: re-run exactly the rows that failed
in round 3d — the three remote-compile HTTP-500 rows (socp n=1000
barrier, lp/qp n=5000 pd) and the socp_pd n=1000 Mosaic f64-squeeze
crash — plus a socp_pd n=100 smoke so the fused dense-KKT kernel gets
at least one small-shape hardware execution.

    PYTHONPATH=/root/repo timeout 7200 python scripts/tpu_round4a.py
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
    ("socp", 100, 2, "pd"),      # small-shape smoke for the kkt kernel
    ("socp", 1000, 2, "pd"),     # round3d: Mosaic f64-squeeze ValueError
    ("socp", 1000, 2, "barrier"),  # round3d: remote-compile HTTP 500
    ("lp", 5000, 2, "pd"),       # round3d: remote-compile HTTP 500
    ("qp", 5000, 2, "pd"),       # round3d: remote-compile HTTP 500
]


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


if __name__ == "__main__":
    main()
