"""Hardware check of the lean diag-block factor + doubling inverse:
isolated block/factor chains (RTT-adjusted) and the fused-kernel
rooflines at the flagship shapes.

    timeout 7200 python scripts/tpu_factor_probe.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/ip_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    rtt = bench.tunnel_rtt()
    print(f"# RTT: {rtt*1e3:.2f} ms", flush=True)

    # new _factor_diag_block chain, in-kernel
    from interiorpoint_tpu.ops.pallas_chol import (_factor_diag_block,
                                                   cholesky_blocked)

    with jax.enable_x64(False):
        def fdb_kernel(x_ref, o_ref):
            def one(i, a):
                L, Linv = _factor_diag_block(a)
                return a + 1e-30 * L + 1e-30 * Linv
            o_ref[:] = lax.fori_loop(0, 200, one, x_ref[:])

        def fdb_chain(x):
            return pl.pallas_call(
                fdb_kernel,
                out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            )(x)

        rng = np.random.default_rng(0)
        A = rng.standard_normal((128, 128))
        H = jnp.asarray((A @ A.T + 256 * np.eye(128)).astype(np.float32))
        jf = jax.jit(fdb_chain)
        jax.block_until_ready(jf(H))
        t0 = time.time()
        jax.block_until_ready(jf(H))
        per = (time.time() - t0 - rtt) / 200
        print(f"# NEW _factor_diag_block: {per*1e6:.2f} us/block "
              f"(was ~85 us)", flush=True)

    for rdim in (256, 1024):
        Ar = rng.standard_normal((rdim, rdim))
        Hr = jnp.asarray((Ar @ Ar.T + rdim * np.eye(rdim))
                         .astype(np.float32))

        def chol_chain(Hm):
            def one(i, acc):
                L, _ = cholesky_blocked(acc)
                return acc + 1e-30 * L
            return lax.fori_loop(0, 100, one, Hm)

        jc = jax.jit(chol_chain)
        jax.block_until_ready(jc(Hr))
        t0 = time.time()
        jax.block_until_ready(jc(Hr))
        per = (time.time() - t0 - rtt) / 100
        print(f"# NEW cholesky_blocked rp={rdim}: {per*1e6:.1f} us/factor "
              f"(was 177/696 us at 256/1024)", flush=True)

    # fused-step rooflines at flagship shapes (RTT-adjusted via bench)
    for suite, n in [("lp", 1000), ("lp", 5000), ("qp", 1000),
                     ("socp", 1000), ("lp-pd", 1000), ("qp-pd", 1000),
                     ("socp-kkt", 1000)]:
        t0 = time.time()
        try:
            res = bench.roofline(suite, n, 30, "float64")
        except Exception as e:
            print(f"# roofline {suite} n={n} FAILED after "
                  f"{time.time()-t0:.0f}s: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            continue
        print(f"# roofline {suite} n={n}: k={res['k']} r={res['r']} "
              f"mode={res['mode']} {res['step_ms']:.3f} ms/step "
              f"({res['frac_f32_eff_peak']*100:.1f}% f32-eff peak)",
              flush=True)

    # end-to-end flagship solves (RTT-adjusted via bench)
    for suite, n, algo in [("lp", 1000, "barrier"), ("qp", 1000, "barrier"),
                           ("socp", 1000, "barrier"),
                           ("lp", 1000, "pd"), ("socp", 1000, "pd"),
                           ("lp", 5000, "pd")]:
        fn = {"lp": bench.bench_lp, "qp": bench.bench_qp,
              "socp": bench.bench_socp}[suite]
        t0 = time.time()
        try:
            mean_s, times, val, note = fn(n, 2, "float64", algorithm=algo)
        except Exception as e:
            print(f"# {suite}_{algo} n={n} FAILED after {time.time()-t0:.0f}s"
                  f": {type(e).__name__}: {str(e)[:300]}", flush=True)
            continue
        print(f"# {suite}_{algo} n={n}: {mean_s:.4f}s obj {val:.8f} {note} "
              f"times {['%.3f' % t for t in times]}", flush=True)


if __name__ == "__main__":
    main()
