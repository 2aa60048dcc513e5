"""Pallas TPU kernels for the IPM's hot linear-algebra ops.

Why these exist: every Newton step of the barrier method factors one (or
two) small-to-medium SPD matrices and runs a battery of triangular solves
(reference hot loop: NewtonSolverInfeasibleStart.py:396-490, which leans on
cuSOLVER `potrf`/`trsm` via CuPy).  XLA:TPU lowers `cholesky` and
`solve_triangular` to *blocked multi-op programs with long sequential
dependency chains*; measured on TPU v5e, one synchronized 200x200 f32
factor+solve chain costs ~10-40 ms of latency even though its FLOPs are
microseconds.  Inside a solver whose entire runtime is one sequential chain
of Newton steps, that latency IS the solve time.

These kernels run the whole factorization / the whole two-triangle solve as
ONE Pallas kernel with every operand resident in VMEM:

* ``cholesky_blocked(H)``      -> (L, Dinv): blocked right-looking Cholesky;
  also returns the inverted 128x128 diagonal blocks so that subsequent
  triangular solves are pure MXU matmuls with no substitution loops.
* ``cholesky_solve_blocked(L, Dinv, B)`` -> X solving (L L^T) X = B, both
  triangles fused into the same kernel.

Design notes (see /opt/skills/guides/pallas_guide.md):
- float32 only: the MXU has no f64; f64 accuracy is recovered outside by
  iterative refinement (ops/kkt.py:mixed_posdef_solve).
- matrices are padded to a multiple of the 128 MXU tile; padding has
  identity diagonal so the factor stays finite and solves stay exact.
- the sequential part (factor + invert one 128x128 diagonal block) is a
  fori_loop of 128 vectorized VPU steps; all O(n^3) bulk work (panel
  updates, trailing syrk, block solves) is MXU `jnp.dot`.
- a failed factor (non-PSD pivot) produces NaN via sqrt/rsqrt of a negative
  number and propagates, matching jnp.linalg.cholesky semantics so the
  caller's jitter-ladder retry (ops/kkt.py:robust_cholesky) works unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128


def _dot(a, b):
    """Full-f32 MXU matmul.  Inside Pallas, default jnp.dot precision uses
    single-pass bf16 MXU products (~8 mantissa bits, rel err ~4e-3) — far
    too coarse for a factor that must let f64 iterative refinement converge
    (needs kappa * err << 1).  HIGHEST selects the 3-pass true-f32 mode."""
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)
# Largest padded dimension the single-kernel path accepts.  VMEM budget at
# 1536: L (9.4 MB) + a block row/col of scratch << 16 MB.
MAX_N = 1536


def _pad_to_block(n: int) -> int:
    return max(BLK, -(-n // BLK) * BLK)


def _factor_diag_block(D):
    """Unblocked Cholesky of a (BLK, BLK) tile + inverse of its factor.

    Returns (L, Linv) with L lower-triangular, L @ L.T = D, Linv @ L = I.

    This chain is the measured sequential floor of every fused step
    kernel (scripts/tpu_latency_probe.py: ~85 us/block for the previous
    form, = nb x 85 us per blocked factor, while all MXU block updates
    are noise), so both halves are built for minimum DEPENDENT-op count
    rather than minimum FLOPs:

    * factor: 128 fori_loop pivots of ~8 chained VPU/MXU ops each —
      masked column extract (Mosaic has no dynamic_slice on values),
      rsqrt, scale, one full rank-1 MXU outer whose stale above-pivot
      garbage is filtered by the trailing mask instead of pre-masking
      the column (saves chain links).  The inverse recursion that used
      to ride in this loop (+6 dependent ops per pivot) is gone.
    * inverse: strictly-lower nilpotent doubling in LOG depth.  With
      L = Lu·diag(d) (Lu unit lower), N = Lu − I satisfies N^128 = 0,
      so Lu⁻¹ = Π_{k=0..6} (I + (−N)^(2^k)) — 12 MXU matmuls total
      (~3 us) instead of a 128-step substitution chain.  The doubling
      product amplifies f32 rounding ~100× over substitution on
      ill-conditioned blocks, so ONE Newton polish W ← (2I − WL)W
      (2 matmuls) squares the residual away — measured BETTER than the
      substitution inverse across the κ=1e6..1e7 range (rate 0.13 vs
      0.74 at κ=4e6).  As with the factor itself, f32 rounding here
      only shapes PRECONDITIONER quality: every consumer wraps it in
      dd refinement/PCG against the true operator.

    A failed factor (non-PSD pivot) produces NaN via rsqrt of a
    negative and propagates through both outputs, preserving
    jnp.linalg.cholesky semantics for the callers' jitter ladders.
    """
    dt = D.dtype
    rows = lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    cols = lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    rcol = rows[:, :1]                                # (BLK, 1)
    eye = jnp.where(rows == cols, jnp.ones((), dt), jnp.zeros((), dt))

    def step(j, A):
        is_jcol = cols == j                           # (BLK, BLK)
        colj = jnp.sum(jnp.where(is_jcol, A, jnp.zeros((), dt)),
                       axis=1, keepdims=True)         # (BLK, 1) = A[:, j]
        pivot = jnp.sum(jnp.where(rcol == j, colj, jnp.zeros((), dt)))
        rpiv = lax.rsqrt(pivot)                       # NaN if pivot < 0
        lcol = colj * rpiv                            # L[:, j] for rows >= j
        # column j of L: diag sqrt(pivot) = pivot*rpiv at row j, scaled
        # below, zero above (colj above the pivot holds stale symmetric
        # trailing values — finite, so the unmasked outer is safe under
        # the trailing mask)
        lkeep = jnp.where(rcol >= j, lcol, jnp.zeros((), dt))
        upd = _dot(lcol, lcol.T)                      # rank-1, MXU
        trail = (rows > j) & (cols > j)
        return (jnp.where(is_jcol, lkeep, A)
                - jnp.where(trail, upd, jnp.zeros((), dt)))

    L = lax.fori_loop(0, BLK, step, D)
    L = jnp.where(rows >= cols, L, jnp.zeros((), dt))

    # ---- Linv by nilpotent doubling (log-depth, pure MXU) --------------
    dcol = jnp.sum(L * eye, axis=1, keepdims=True)    # (BLK, 1) diag(L)
    drow = jnp.sum(L * eye, axis=0, keepdims=True)    # (1, BLK)
    Lu = L * (1.0 / drow)                             # unit lower (cols/d)
    N = Lu - eye                                      # strictly lower
    P = eye - N
    T = _dot(N, N)                                    # N^2

    def dbl(k, c):
        P, T = c
        P = P + _dot(P, T)
        return P, _dot(T, T)

    P, _ = lax.fori_loop(1, 7, dbl, (P, T))
    # L⁻¹ = diag(d)⁻¹ · Lu⁻¹  (row scaling), then one Newton polish
    W = P * (1.0 / dcol)
    W = _dot(2.0 * eye - _dot(W, L), W)
    return L, W


def _chol_kernel(h_ref, l_ref, dinv_ref, *, nb: int):
    """Blocked right-looking Cholesky over an (nb*BLK, nb*BLK) VMEM tile."""
    l_ref[:] = h_ref[:]
    for kb in range(nb):
        k0 = kb * BLK
        D = l_ref[k0:k0 + BLK, k0:k0 + BLK]
        # subtract contributions of previous column blocks: D -= Lk: @ Lk:^T
        if kb > 0:
            Lrow = l_ref[k0:k0 + BLK, 0:k0]
            D = D - _dot(Lrow, Lrow.T)
        Lkk, Linv = _factor_diag_block(D)
        l_ref[k0:k0 + BLK, k0:k0 + BLK] = Lkk
        dinv_ref[k0:k0 + BLK, :] = Linv
        # panel below: L[i, k] = (H[i, k] - L[i, :k] @ L[k, :k]^T) @ Linv^T
        if kb + 1 < nb:
            r0 = k0 + BLK
            P = l_ref[r0:, k0:k0 + BLK]
            if kb > 0:
                Lbelow = l_ref[r0:, 0:k0]
                Lrow = l_ref[k0:k0 + BLK, 0:k0]
                P = P - _dot(Lbelow, Lrow.T)
            l_ref[r0:, k0:k0 + BLK] = _dot(P, Linv.T)
    # zero strict upper triangle for jnp.linalg.cholesky parity
    n = nb * BLK
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[:] = jnp.where(rows >= cols, l_ref[:], jnp.zeros((), jnp.float32))


def _solve_kernel(l_ref, dinv_ref, b_ref, x_ref, *, nb: int):
    """Fused (L L^T) X = B: forward then backward block substitution,
    all block ops on the MXU (diagonal inverses precomputed by the factor
    kernel)."""
    # forward: L Y = B
    for kb in range(nb):
        k0 = kb * BLK
        acc = b_ref[k0:k0 + BLK, :]
        if kb > 0:
            acc = acc - _dot(l_ref[k0:k0 + BLK, 0:k0], x_ref[0:k0, :])
        x_ref[k0:k0 + BLK, :] = _dot(dinv_ref[k0:k0 + BLK, :], acc)
    # backward: L^T X = Y
    for kb in reversed(range(nb)):
        k0 = kb * BLK
        acc = x_ref[k0:k0 + BLK, :]
        if kb + 1 < nb:
            r0 = k0 + BLK
            acc = acc - _dot(l_ref[r0:, k0:k0 + BLK].T, x_ref[r0:, :])
        x_ref[k0:k0 + BLK, :] = _dot(dinv_ref[k0:k0 + BLK, :].T, acc)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_blocked(H, *, interpret: bool = False):
    """Cholesky factor of an (n, n) f32 SPD matrix as one Pallas kernel.

    Returns (L, Dinv): L is (n, n) lower-triangular with L @ L.T = H;
    Dinv is (n_pad, BLK) — the inverted diagonal blocks of the padded
    factor, consumed by cholesky_solve_blocked.
    """
    n = H.shape[0]
    np_ = _pad_to_block(n)
    nb = np_ // BLK
    Hp = jnp.zeros((np_, np_), jnp.float32)
    Hp = Hp.at[:n, :n].set(H.astype(jnp.float32))
    # identity padding keeps the factor finite and solves exact
    idx = jnp.arange(np_)
    pad_diag = jnp.where(idx >= n, 1.0, 0.0).astype(jnp.float32)
    Hp = Hp + jnp.diag(pad_diag)

    kernel = functools.partial(_chol_kernel, nb=nb)
    # x64-disabled trace: see ops/pallas_newton.py (Mosaic recursion bug)
    ctx = jax.enable_x64(False)
    with ctx:
        L, Dinv = pl.pallas_call(
        kernel,
            out_shape=(
                jax.ShapeDtypeStruct((np_, np_), jnp.float32),
                jax.ShapeDtypeStruct((np_, BLK), jnp.float32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            interpret=interpret,
        )(Hp)
    return L[:n, :n], Dinv


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_solve_blocked(L, Dinv, B, *, interpret: bool = False):
    """Solve (L L^T) X = B in one fused Pallas kernel.

    L: (n, n) from cholesky_blocked; Dinv: its inverted diagonal blocks;
    B: (n,) or (n, p).
    """
    n = L.shape[0]
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    p = B.shape[1]
    np_ = _pad_to_block(n)
    pp = _pad_to_block(p)
    nb = np_ // BLK

    Lp = jnp.zeros((np_, np_), jnp.float32)
    Lp = Lp.at[:n, :n].set(L.astype(jnp.float32))
    idx = jnp.arange(np_)
    pad_diag = jnp.where(idx >= n, 1.0, 0.0).astype(jnp.float32)
    Lp = Lp + jnp.diag(pad_diag)
    Bp = jnp.zeros((np_, pp), jnp.float32)
    Bp = Bp.at[:n, :p].set(B.astype(jnp.float32))

    kernel = functools.partial(_solve_kernel, nb=nb)
    with jax.enable_x64(False):
        X = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((np_, pp), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(Lp, Dinv, Bp)
    X = X[:n, :p]
    return X[:, 0] if vec else X


def supported(n: int, p: int = BLK) -> bool:
    """Whether the single-kernel VMEM-resident path fits this problem."""
    np_ = _pad_to_block(n)
    return np_ <= MAX_N and _pad_to_block(p) <= MAX_N
