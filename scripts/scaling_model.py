"""Analytic compute/communication model for the row-sharded LP solve.

The virtual CPU mesh (scripts/scaling_table.py) validates the collective
layout but CANNOT measure real scaling — its "devices" share one host's
cores, so strong-scaling efficiency there is bounded by 1/N by
construction.  This script provides the honest counterpart for the
BASELINE.md ">=70% scaling efficiency" bar: a per-iteration cost model of
``parallel/distributed.py:_row_sharded_barrier`` built from exact FLOP
and collective-byte counts of the algorithm, evaluated with TPU v5e
hardware parameters.

Work classes and their MEASURED v5e rates (anchors at n=1000 shapes,
f64-equivalent FLOP/s; see the dd-strategy notes in the repo history):

  MXU class (Gram/panels/sweeps — dd/f32 split matmuls): 4.2e12
  XLA cholesky, f64 emulated:  chol(1000) 77 ms  -> 4.3e9   (!)
  XLA cholesky, f32 (mixed factor_dtype): 5.4 ms -> 6.2e10
  triangular panel solves (many-rhs, matmul-like): 4e11 (conservative)

The 70-1000x gap between the MXU class and XLA's Cholesky lowering is
the load-bearing fact: ``factor_dtype="float32"`` (mixed factor +
refinement) buys ~14x on the factor term, and ``distributed_factor``
(parallel/chol.py) converts the factor's O(n^3) bulk from the XLA
Cholesky path into MXU einsum trailing updates split 1/N per chip —
its win on hardware comes from that conversion, NOT from the 1/N alone
(at equal rates the lazy full-height update would cost 2n^3/N MACs vs
n^3/6 replicated and lose below ~12 chips).

Per Newton iteration (J = line-search candidates, W = 8 B/f64 word):

  parallelizable MXU compute (1/N per chip):
    Gram CtD2C 2kn^2; candidate sweep 2knJ; Schur panels 4n^2m;
    A.Y 2m^2n; refinement matvecs 2(4kn+4mn)
    [+ distributed-factor trailing updates 2(n^3+m^3)]
  replicated compute:
    factor: (n^3+m^3)/3 at the chol-class rate (unless distributed)
    [+ dist-factor replicated panel trisolves 2(n^2+m^2)*BS]
    vector solves ~20n^2 (trisolve class)
  communication (1-D ring; all-reduce moves 2(N-1)/N bytes,
  all-gather (N-1)/N):
    psum H n^2W; psum candidate grads nJW; gathers Y nmW + S m^2W;
    ~12 vector psums; [dist-factor: panel psums (n^2+m^2)W and
    factor gathers (n^2+m^2)W]; latency n_coll*(N-1)*hop

  T(N) = sum(class_work/class_rate with MXU work /N) + comm(N)
  efficiency(N) = T_best(1) / (N * T(N)),  T_best(1) = the fastest
  single-chip configuration of the SAME factor precision (replicated
  factor — a 1-chip distributed factor only adds lazy-update overhead).

Scenarios reported: f64 replicated factor (the default), f32 mixed
replicated factor, f32 mixed + distributed factor.

Usage: python scripts/scaling_model.py [n] [out.csv]
Writes a table of efficiency vs N and the min-n frontier for >=70%.
"""
import sys

# Re-anchored at round-5 HEAD (VERDICT r4 item 8): the round-2 anchor
# (4.2e12) predated the lean factor, the chunk-fused Gram, the RTT
# correction, and the round-5 step work.  The HEAD in-situ rate of the
# dd/f32 split-matmul class is the measured LP n=5000 streaming step:
# 12.1 TFLOP/s f64-equivalent over the WHOLE step (round5d_raw.log) —
# conservative as a class rate since it averages the factor/refine
# fractions in.
RATE_MXU = 1.21e13   # dd/f32 split-matmul class, f64-equivalent F/s
RATE_TRI = 4e11      # many-rhs triangular solves (matmul-like, conservative)

# XLA Cholesky structural model: a blocked factor is (n/b) sequential
# b-wide panel factors (scalar-path bound — this is what the n=1000
# anchors measure, trailing matmuls there are negligible) plus trailing
# matmul updates at the MXU-class rate.  t = (n/b)*t_panel + (n^3/3)/r.
CHOL_B = 128
T_PANEL32 = 5.4e-3 / 8     # chol(1000) f32 = 5.4 ms, 8 panels
T_PANEL64 = 77e-3 / 8      # chol(1000) f64-emulated = 77 ms
RATE_TRAIL32 = 8.4e12      # f32 matmul trailing updates
RATE_TRAIL64 = 1.0e12      # emulated-f64 trailing updates


def t_chol(n, f32):
    panels = n / CHOL_B
    if f32:
        return panels * T_PANEL32 + (n**3 / 3.0) / RATE_TRAIL32
    return panels * T_PANEL64 + (n**3 / 3.0) / RATE_TRAIL64
BW = 9e10            # ICI ring bandwidth, bytes/s
HOP_LAT = 1e-6       # per-hop collective latency, s
N_COLLECTIVES = 16   # collectives per Newton iteration (counted in source)
J = 40               # line-search candidates (max_linesearch_steps)
W = 8                # bytes per f64 word
BS = 256             # dist_cholesky panel width (parallel/chol.py)


def shapes(n):
    """Reference LP benchmark row-heavy recipe (scaling_table.py)."""
    return int(0.8 * n), int(3.0 * n)     # m equality, k inequality rows


def iteration_model(n, m, k, ndev, factor="f64", dist_factor=False):
    mxu = (2 * k * n * n                  # Gram
           + 2 * k * n * J                # candidate sweep
           + 4 * n * n * m                # Schur panels
           + 2 * m * m * n                # A·Y
           + 2 * (4 * k * n + 4 * m * n)) # refinement matvecs
    tri = 20 * n * n                      # replicated vector solves
    t_factor = 0.0
    allreduce = (n * n + n * J + 12 * n) * W
    allgather = (n * m + m * m) * W
    if dist_factor:
        # block-cyclic factor: trailing updates are MXU einsums, lazy
        # full-height (2x MACs), split 1/N; bs-wide panel chols and
        # panel trisolves replicate; panel psums + factor gathers add
        # n^2-class words per factor.
        mxu += 2 * (n**3 + m**3)
        tri += 2 * (n * n + m * m) * BS
        t_factor = ((n + m) / BS) * (
            T_PANEL32 if factor == "f32" else T_PANEL64) * (BS / CHOL_B)
        allreduce += (n * n + m * m) * W
        allgather += (n * n + m * m) * W
    else:
        t_factor = t_chol(n, factor == "f32") + t_chol(m, factor == "f32")
    if factor == "f32":
        mxu += 2 * (4 * k * n + 4 * m * n)   # one extra refinement round
    frac = (ndev - 1) / max(ndev, 1)
    t_comm = (2 * allreduce + allgather) * frac / BW \
        + N_COLLECTIVES * (ndev - 1) * HOP_LAT
    t = (mxu / (ndev * RATE_MXU) + t_factor + tri / RATE_TRI
         + t_comm)
    return t, t_comm


def efficiency(n, ndev, factor="f64", dist_factor=False):
    """Strong-scaling efficiency vs the SAME configuration at N=1
    (cross-configuration speedups are reported as absolute t_iter)."""
    m, k = shapes(n)
    t1, _ = iteration_model(n, m, k, 1, factor=factor,
                            dist_factor=dist_factor)
    tn, comm = iteration_model(n, m, k, ndev, factor=factor,
                               dist_factor=dist_factor)
    return t1 / (ndev * tn), tn, comm


SCEN = (("f64-repl", "f64", False),
        ("f32-repl", "f32", False),
        ("f32-dist", "f32", True))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out_csv = sys.argv[2] if len(sys.argv) > 2 else None

    m, k = shapes(n)
    rows = []
    print(f"# row-sharded LP scaling model, n={n} (m={m}, k={k}); "
          f"rates: mxu={RATE_MXU:.1e} F/s, chol(n) f32 "
          f"{t_chol(n, True)*1e3:.1f} ms / f64 {t_chol(n, False)*1e3:.1f}"
          f" ms; ici={BW:.1e} B/s")
    hdr = f"{'N':>3}"
    for name, _, _ in SCEN:
        hdr += f" {name + '_t_ms':>14} {name + '_eff':>13}"
    print(hdr)
    for ndev in (1, 2, 4, 8, 16):
        row = [ndev]
        line = f"{ndev:>3}"
        for _, fac, dist in SCEN:
            eff, tn, _ = efficiency(n, ndev, factor=fac, dist_factor=dist)
            row += [tn * 1e3, eff]
            line += f" {tn*1e3:>14.2f} {eff:>13.3f}"
        rows.append(row)
        print(line)

    print("\n# smallest n with efficiency >= 0.70:")
    frontier = []
    for ndev in (2, 4, 8, 16):
        lo = {}
        for name, fac, dist in SCEN:
            lo[name] = None
            for cand in range(500, 60001, 250):
                if efficiency(cand, ndev, factor=fac,
                              dist_factor=dist)[0] >= 0.70:
                    lo[name] = cand
                    break
        frontier.append((ndev, lo))
        print(f"  N={ndev}: " + "; ".join(f"{nm}: n>={v}"
                                          for nm, v in lo.items()))

    if out_csv:
        with open(out_csv, "w") as f:
            cols = ["ndev"]
            for name, _, _ in SCEN:
                cols += [f"{name}_t_iter_ms", f"{name}_efficiency"]
            f.write(",".join(cols) + "\n")
            for r in rows:
                f.write(",".join(f"{v:.4f}" if isinstance(v, float)
                                 else str(v) for v in r) + "\n")
            f.write("# min_n for eff>=0.70: " + " | ".join(
                f"N={a}: " + ";".join(f"{nm}>={v}" for nm, v in lo.items())
                for a, lo in frontier) + "\n")
        print(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
