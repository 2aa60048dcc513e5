"""Round-5o: the pd kernels (now the production LP/QP engines) with the
block-LDL/NS hybrid factor — solve surfaces at HEAD.

    timeout 6000 python scripts/tpu_round5o.py 2>&1 | tee benchmarks/results/round5o_raw.log
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


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    for attempt in range(8):
        try:
            np.asarray(jnp.ones(8) * 2.0)
            break
        except Exception as e:
            print(f"warm fail {attempt}: {type(e).__name__}", flush=True)
            time.sleep(60)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    print(f"# RTT: {bench.tunnel_rtt()*1e3:.2f} ms", flush=True)

    for tag, fn, n, reps, kw in [
        ("qp1000_pd", bench.bench_qp, 1000, 3, {"algorithm": "pd"}),
        ("lp1000_pd", bench.bench_lp, 1000, 3, {"algorithm": "pd"}),
        ("lp5000_pd", bench.bench_lp, 5000, 2, {"algorithm": "pd"}),
        ("qp5000_pd", bench.bench_qp, 5000, 2, {"algorithm": "pd"}),
    ]:
        t0 = time.time()
        try:
            mean_s, times, val, note, raw = fn(n, reps, "float64", **kw)
            print(f"# {tag}: {mean_s:.4f}s "
                  f"raw={['%.3f' % t for t in raw]} obj {val:.8f} {note} "
                  f"wall {time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# {tag} FAILED after {time.time()-t0:.0f}s: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        gc.collect()
        if n >= 3000:
            jax.clear_caches()
            gc.collect()


if __name__ == "__main__":
    main()
