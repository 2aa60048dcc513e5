"""Round-5l: decompose the pure-XLA SOCP step at n=3000 (r=2950) —
which pass holds the 24.4 ms/step (round5d2): the Gram einsums, the
XLA f32 Cholesky + triangular inverse (_factor_w_xla), or the dd
refinement?  Each piece timed as its own warmed jitted chain with
operands as arguments (no closure constants).

    timeout 6000 python scripts/tpu_round5l.py 2>&1 | tee benchmarks/results/round5l_raw.log
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ip_tpu_jax_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

jax.config.update("jax_enable_x64", True)
os.makedirs("/tmp/ip_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ip_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402


def timed_chain(fn, args, reps, tag):
    """jit fn(*args) chained reps times (operands as args), steady."""
    def chain(*a):
        def body(i, c):
            return fn(*((c,) + a[1:]))
        return lax.fori_loop(0, reps, body, a[0])
    jc = jax.jit(chain)
    jax.block_until_ready(jc(*args))
    t0 = time.time()
    jax.block_until_ready(jc(*args))
    dt = (time.time() - t0 - bench.tunnel_rtt()) / reps
    print(f"# {tag}: {dt*1e3:.3f} ms/iter (reps={reps})", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    t0 = time.time()
    for attempt in range(6):
        try:
            np.asarray(jnp.ones(8) * 2.0)
            break
        except Exception as e:
            print(f"warm fail {attempt}: {type(e).__name__}", flush=True)
            time.sleep(60)
    print(f"d2h warm: {time.time()-t0:.1f}s", flush=True)
    print(f"# RTT: {bench.tunnel_rtt()*1e3:.2f} ms", flush=True)

    from interiorpoint_tpu.ops.xl_step import (_equilibrate_xla,
                                               _factor_w_xla)
    from interiorpoint_tpu.ops.pallas_newton import _pad

    r = 2950
    rp = _pad(r)
    KM = 12000
    rng = np.random.default_rng(0)
    # representative f32 Hs (equilibrated SPD)
    M = rng.standard_normal((KM, rp)).astype(np.float32) / np.sqrt(KM)
    Hs = jnp.asarray(M.T @ M + 1e-3 * np.eye(rp, dtype=np.float32))
    Hs, dsc = _equilibrate_xla(Hs, r, rp)
    Hs = jnp.asarray(Hs)

    # 1. factor + triangular inverse (the _factor_w_xla chain)
    # (production calls this under enable_x64(False) — without it the
    # jitter literals promote to f64 and the internal while_loop carry
    # types mismatch)
    def fac(x, Hs_):
        with jax.enable_x64(False):
            W = _factor_w_xla(Hs_ + x[0, 0] * 0.0, rp)
        return x + jnp.float32(1e-20) * W[:1, :1]
    if os.environ.get("SKIP_FAC", "0") != "1":
        timed_chain(fac, (jnp.ones((1, 1), jnp.float32), Hs), 6,
                    f"factor+inverse rp={rp}")

    # 2. chol only
    def chol_only(x, Hs_):
        with jax.enable_x64(False):
            L = jnp.linalg.cholesky(Hs_ + x[0, 0] * 0.0)
        return x + jnp.float32(1e-20) * L[:1, :1]
    if os.environ.get("SKIP_FAC", "0") != "1":
        timed_chain(chol_only, (jnp.ones((1, 1), jnp.float32), Hs), 6,
                    f"chol only rp={rp}")

    # 3. the Gram-class work: one f32 HIGHEST (KM, rp)^T (KM, rp)
    A32 = jnp.asarray(M)

    def gram(x, A_):
        H = jnp.matmul(A_.T, A_ * (jnp.float32(1.0) + x[0, 0] * 0.0),
                       precision=jax.lax.Precision.HIGHEST)
        return (x + jnp.float32(1e-20) * H[:1, :1]).astype(jnp.float32)
    timed_chain(gram, (jnp.ones((1, 1), jnp.float32), A32), 10,
                f"f32 HIGHEST gram (KM={KM}, rp={rp})")

    # 4. one dd matvec pair over the stacked map (refinement-pass class)
    from interiorpoint_tpu.ops import dd
    Ahi, Alo = dd.split_f64(jnp.asarray(
        rng.standard_normal((KM, rp))))
    xh = jnp.ones((1, rp), jnp.float32)

    def ddpass(x, Ah, Al):
        ph, pl_ = dd.dd_mul(Ah, Al, x, jnp.zeros_like(x))
        h, l = dd.dd_reduce(ph, pl_, axis=0)
        ph2, pl2 = dd.dd_mul(Ah, Al, h[:1, :1] * 0 + 1.0, l[:1, :1] * 0)
        h2, _ = dd.dd_reduce(ph2, pl2, axis=0)
        return (x + jnp.float32(1e-20) * h2[:1, :1]).astype(jnp.float32)
    timed_chain(ddpass, (xh, Ahi, Alo), 6,
                f"dd fwd+bwd pass (KM={KM}, rp={rp})")


if __name__ == "__main__":
    main()
