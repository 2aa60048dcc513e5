"""Analytic compute/communication model for the row-sharded LP solve.

The virtual CPU mesh (scripts/scaling_table.py) validates the collective
layout but CANNOT measure real scaling — its "devices" share one host's
cores, so strong-scaling efficiency there is bounded by 1/N by
construction.  This script provides the honest counterpart for the
BASELINE.md ">=70% scaling efficiency" bar: a per-iteration cost model of
``parallel/distributed.py:_row_sharded_barrier`` built from exact FLOP
and collective-byte counts of the algorithm, evaluated with TPU v5e
hardware parameters.

Model (per Newton iteration, f64 words = 8 bytes):

  parallelizable compute (perfectly row-sharded, 1/N per chip):
    Gram CᵀD²C               2·k·n²
    candidate sweep CᵀG      2·k·n·J      (J backtracking candidates)
    Schur panels H⁻¹Aᵀ       2·2·n²·m     (two triangular solves, m rhs)
    panel product A·Y        2·m²·n
    refinement matvecs       2·(2·2·k·n + 2·2·m·n)   (2 passes)
  replicated compute (serial Amdahl core, identical on every chip):
    chol(H) + chol(S)        n³/3 + m³/3
    vector solves            ~10·2·n²
  communication (1D ring; ring all-reduce moves 2·(N−1)/N·bytes,
  all-gather (N−1)/N·bytes):
    psum H                   n²·8
    psum candidate grads     n·J·8
    all_gather Y panels      n·m·8
    all_gather S rows        m²·8
    ~12 vector psums         12·n·8
    latency                  n_collectives·(N−1)·hop_latency

  T(N) = parallel/(N·rate) + serial/rate + comm(N)/bw + latency(N)
  efficiency(N) = T(1) / (N·T(N))   [strong scaling, fixed problem]

Defaults: effective dense-f64-equivalent rate 4e12 FLOP/s per chip —
the rate the repo MEASURED for its mixed dd/f32 pipeline on v5e at
benchmark shapes (memory: f32 Gram at (11000,1000) runs 5.2 ms =
4.2e12 F/s; the dd refinement roughly halves it, factor runs f32) —
and ICI ring bandwidth 9e10 B/s (v5e: 45 GB/s/direction links,
bidirectional ring over one torus axis).

Usage: python scripts/scaling_model.py [n] [out.csv]
Writes a table of efficiency vs N and the min-n frontier for >=70%.
"""
import sys

RATE = 4e12          # effective per-chip FLOP/s (measured, see docstring)
BW = 9e10            # ICI ring bandwidth, bytes/s
HOP_LAT = 1e-6       # per-hop collective latency, s
N_COLLECTIVES = 16   # collectives per Newton iteration (counted in source)
J = 40               # line-search candidates (max_linesearch_steps)
W = 8                # bytes per f64 word


def shapes(n):
    """Reference LP benchmark row-heavy recipe (scaling_table.py)."""
    return int(0.8 * n), int(3.0 * n)     # m equality, k inequality rows


def iteration_model(n, m, k, ndev):
    par = (2 * k * n * n                  # Gram
           + 2 * k * n * J                # candidate sweep
           + 4 * n * n * m                # Schur panels
           + 2 * m * m * n                # A·Y
           + 2 * (4 * k * n + 4 * m * n)) # refinement matvecs
    ser = (n**3 / 3 + m**3 / 3            # replicated factorizations
           + 20 * n * n)                  # vector solves
    allreduce = (n * n + n * J + 12 * n) * W
    allgather = (n * m + m * m) * W
    frac = (ndev - 1) / max(ndev, 1)
    t_comm = (2 * allreduce + allgather) * frac / BW \
        + N_COLLECTIVES * (ndev - 1) * HOP_LAT
    t = par / (ndev * RATE) + ser / RATE + t_comm
    return t, par, ser, t_comm


def efficiency(n, ndev):
    m, k = shapes(n)
    t1, *_ = iteration_model(n, m, k, 1)
    tn, par, ser, comm = iteration_model(n, m, k, ndev)
    return t1 / (ndev * tn), tn, ser / (par + ser), comm


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    out_csv = sys.argv[2] if len(sys.argv) > 2 else None

    rows = []
    print(f"# row-sharded LP scaling model, n={n} (m={shapes(n)[0]}, "
          f"k={shapes(n)[1]}), rate={RATE:.1e} F/s, ici={BW:.1e} B/s")
    print(f"{'N':>3} {'t_iter_ms':>10} {'comm_ms':>8} {'serial%':>8} "
          f"{'efficiency':>11}")
    for ndev in (1, 2, 4, 8, 16):
        eff, tn, serfrac, comm = efficiency(n, ndev)
        rows.append((ndev, tn * 1e3, comm * 1e3, serfrac, eff))
        print(f"{ndev:>3} {tn*1e3:>10.2f} {comm*1e3:>8.2f} "
              f"{100*serfrac:>7.1f}% {eff:>11.3f}")

    # min-n frontier for the >=70% bar
    print("\n# smallest n with efficiency >= 0.70:")
    frontier = []
    for ndev in (2, 4, 8, 16):
        lo = None
        for cand in range(500, 40001, 250):
            if efficiency(cand, ndev)[0] >= 0.70:
                lo = cand
                break
        frontier.append((ndev, lo))
        print(f"  N={ndev}: n >= {lo}")

    if out_csv:
        with open(out_csv, "w") as f:
            f.write("ndev,t_iter_ms,comm_ms,serial_frac,efficiency\n")
            for r in rows:
                f.write(f"{r[0]},{r[1]:.4f},{r[2]:.4f},{r[3]:.4f},"
                        f"{r[4]:.4f}\n")
            f.write("# min_n for eff>=0.70: "
                    + "; ".join(f"N={a}:n>={b}" for a, b in frontier)
                    + "\n")
        print(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
