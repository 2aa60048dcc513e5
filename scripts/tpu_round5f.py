"""Round-5f: socp-pd after the double-float contraction fix.

round5e showed the engine's cost was emulated-f64 einsum glue (12
ms/iteration + 1.96 s JG precompute), not the direction solves; this
re-measures the solve surface at HEAD and retries n=5000 (whose
previous compile crash predated the dd rewrite).

    timeout 9000 python scripts/tpu_round5f.py 2>&1 | tee benchmarks/results/round5f_raw.log
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

    for tag, n, reps, algo in [
        ("socp1000_pd", 1000, 3, "pd"),
        ("socp1000_barrier", 1000, 2, "barrier"),
        ("socp3000_pd", 3000, 2, "pd"),
        ("socp5000_pd", 5000, 1, "pd"),
    ]:
        t0 = time.time()
        try:
            mean_s, times, val, note, raw = bench.bench_socp(
                n, reps, "float64", algorithm=algo)
            print(f"# {tag}: {mean_s:.4f}s "
                  f"raw={['%.3f' % t for t in raw]} obj {val:.8f} "
                  f"wall {time.time()-t0:.0f}s", flush=True)
        except Exception as e:
            print(f"# {tag} FAILED after {time.time()-t0:.0f}s: "
                  f"{type(e).__name__}: {str(e)[:400]}", flush=True)
        hygiene()


if __name__ == "__main__":
    main()
