"""Primitive-latency probe with explicit host-dispatch (tunnel RTT)
subtraction.

The first version of this probe discovered that EVERY timed dispatch on
this axon rig pays a ~24.5 ms host→device→host roundtrip: chaining 200
trivial pallas launches, 200 in-kernel VPU fmas, or 200 MXU dots inside
one jit all measured ~123 us/iter — i.e. total ≈ RTT regardless of
content.  All prior sub-ms per-step numbers (roofline reps=30, the
30-chain chol_blocked timings) therefore carry RTT/reps of phantom
latency (~0.8 ms/step at reps=30).

This version measures the RTT explicitly (empty dispatch), uses long
chains, and reports RTT-subtracted per-iteration costs.

    timeout 3600 python scripts/tpu_latency_probe.py
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/ip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RTT = None


def measure_rtt():
    """Median wall time of a minimal dispatch+fetch."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.ones((8, 128), jnp.float32)
    jax.block_until_ready(f(x))
    ts = []
    for _ in range(15):
        t0 = time.time()
        jax.block_until_ready(f(x))
        ts.append(time.time() - t0)
    return float(np.median(ts))


def bench(fn, x, label, iters):
    jf = jax.jit(fn)
    jax.block_until_ready(jf(x))
    t0 = time.time()
    jax.block_until_ready(jf(x))
    total = time.time() - t0
    per = (total - RTT) / iters
    print(f"# {label}: {per*1e6:.3f} us/iter (total {total*1e3:.1f} ms,"
          f" RTT-adj)", flush=True)
    return per


def main():
    global RTT
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    np.asarray(jnp.ones(8) * 2.0)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    RTT = measure_rtt()
    print(f"# tunnel RTT (empty dispatch): {RTT*1e3:.2f} ms", flush=True)

    # 1. on-device pallas_call launch cost (inside fori_loop, one jit)
    def triv_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    N1 = 2000

    def triv_chain(x):
        def one(i, a):
            return pl.pallas_call(
                triv_kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(a)
        return lax.fori_loop(0, N1, one, x)

    bench(triv_chain, jnp.ones((8, 128), jnp.float32),
          "on-device pallas_call launch", N1)

    # 2. chained VPU ops INSIDE one kernel
    N2 = 20000

    def vpu_kernel(x_ref, o_ref, *, shape):
        def one(i, a):
            return a * 1.0000001 + 0.5
        o_ref[:] = lax.fori_loop(0, N2, one, x_ref[:])

    for shape in [(8, 128), (128, 128), (256, 256)]:
        def chain(x, shape=shape):
            return pl.pallas_call(
                functools.partial(vpu_kernel, shape=shape),
                out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            )(x)
        bench(chain, jnp.ones(shape, jnp.float32),
              f"in-kernel chained VPU fma {shape}", N2)

    # 3. chained masked-reduction (the diag-factor's per-pivot pattern)
    def mask_kernel(x_ref, o_ref):
        rows = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        cols = lax.broadcasted_iota(jnp.int32, (128, 128), 1)

        def one(j, a):
            is_jcol = cols == (j % 128)
            col = jnp.sum(jnp.where(is_jcol, a, 0.0), axis=1, keepdims=True)
            return a + col * 1e-9

        o_ref[:] = lax.fori_loop(0, N2, one, x_ref[:])

    def mchain(x):
        return pl.pallas_call(
            mask_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(x)
    bench(mchain, jnp.ones((128, 128), jnp.float32),
          "in-kernel chained masked col-extract (128,128)", N2)

    # 4. chained MXU dots inside one kernel
    N3 = 20000

    def mxu_kernel(x_ref, o_ref, *, m, k, n):
        b = x_ref[:k, :n] * 0.001

        def one(i, a):
            return jnp.dot(a[:, :k] * 0.999, b,
                           precision=lax.Precision.HIGHEST,
                           preferred_element_type=jnp.float32)
        o_ref[:] = lax.fori_loop(0, N3, one, x_ref[:m, :n])

    for (m, k, n) in [(128, 128, 128), (8, 128, 128), (1, 256, 256),
                      (1, 1024, 1024)]:
        def mxchain(x, m=m, k=k, n=n):
            return pl.pallas_call(
                functools.partial(mxu_kernel, m=m, k=k, n=n),
                out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            )(x)
        bench(mxchain, jnp.ones((max(m, k, 8), max(n, k)), jnp.float32),
              f"in-kernel chained MXU dot ({m},{k})x({k},{n})", N3)

    # 5. the current diag-block factor, isolated in its own kernel
    from interiorpoint_tpu.ops.pallas_chol import _factor_diag_block

    N4 = 200

    def fdb_kernel(x_ref, o_ref):
        def one(i, a):
            L, Linv = _factor_diag_block(a)
            return a + 1e-30 * L + 1e-30 * Linv
        o_ref[:] = lax.fori_loop(0, N4, one, x_ref[:])

    def fdb_chain(x):
        return pl.pallas_call(
            fdb_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(x)
    rng = np.random.default_rng(0)
    A = rng.standard_normal((128, 128))
    H = jnp.asarray((A @ A.T + 256 * np.eye(128)).astype(np.float32))
    bench(fdb_chain, H, "in-kernel _factor_diag_block (128x128 + inv)", N4)

    # 6. full blocked factor chains at kernel granularity (RTT-adj)
    from interiorpoint_tpu.ops.pallas_chol import cholesky_blocked

    for rdim in (256, 512, 1024):
        Ar = rng.standard_normal((rdim, rdim))
        Hr = jax.numpy.asarray((Ar @ Ar.T + rdim * np.eye(rdim))
                               .astype(np.float32))

        def chol_chain(Hm):
            def one(i, acc):
                L, _ = cholesky_blocked(acc)
                return acc + 1e-30 * L
            return lax.fori_loop(0, 100, one, Hm)

        bench(chol_chain, Hr, f"cholesky_blocked rp={rdim} (x100)", 100)

    # 7. XLA's native f32 cholesky for comparison
    for rdim in (256, 1024):
        Ar = rng.standard_normal((rdim, rdim))
        Hr = jax.numpy.asarray((Ar @ Ar.T + rdim * np.eye(rdim))
                               .astype(np.float32))

        def xla_chain(Hm):
            def one(i, acc):
                L = jnp.linalg.cholesky(acc)
                return acc + 1e-30 * L
            return lax.fori_loop(0, 30, one, Hm)

        bench(xla_chain, Hr, f"XLA cholesky rp={rdim} (x30)", 30)


if __name__ == "__main__":
    main()
