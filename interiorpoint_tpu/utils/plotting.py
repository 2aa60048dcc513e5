"""Benchmark-result analysis and plotting.

Port target: reference parseAndPlot.py — CSV parsing (:7-141), average
relative error vs oracle truth with non-convergence masking (:411-482), and
timing plots (:177-409).  Matplotlib imports are deferred so headless
environments can use the numeric parts freely.
"""

from __future__ import annotations

import numpy as np

from .csvio import mean_over_reps, read_results


def calculate_average_relative_error(truth, test_results, lasso=False,
                                     verbose=False):
    """Average relative error vs oracle truth, masking non-converged
    (inf) and skipped (zero) runs (reference: parseAndPlot.py:411-482)."""
    truth = np.asarray(truth)
    test_results = np.asarray(test_results)
    if not lasso:
        num_tests, N = truth.shape
        dim_wise = []
        for test in range(num_tests):
            t_row, r_row = truth[test], test_results[test]
            mask = (r_row != np.inf) & (r_row != 0) & ~np.isnan(r_row)
            if verbose:
                print(f"Test {test + 1} had {(~mask).sum()} of {N} "
                      "iterations not converge")
            if mask.sum() == 0:
                dim_wise.append(np.inf)
                continue
            rel = np.abs(t_row[mask] - r_row[mask]) / t_row[mask]
            dim_wise.append(rel.sum() / mask.sum())
        return sum(dim_wise) / num_tests

    num_tests, N, num_problems = truth.shape
    dim_wise = []
    for test in range(num_tests):
        for n in range(N):
            t_row = truth[test, n]
            r_row = test_results[test, n]
            mask = (r_row != np.inf) & ~np.isnan(r_row)
            if verbose:
                print(f"Test {test + 1}, iteration {n + 1} had "
                      f"{num_problems - mask.sum()} of {num_problems} "
                      "problems not converge")
            if mask.sum() == 0:
                dim_wise.append(np.inf)
                continue
            rel = np.abs(t_row[mask] - r_row[mask]) / t_row[mask]
            dim_wise.append(rel.sum() / mask.sum())
    return sum(dim_wise) / len(dim_wise)


def plot_timing_comparison(results, dims, labels=None, title="",
                           logy=True, ax=None):
    """Mean solve time vs problem dimension for several solver columns
    (reference plot styles: parseAndPlot.py:177-409).

    ``results``: list of (num_tests, N) arrays or paths to reference-format
    CSVs; ``dims``: dimension per row.
    """
    import matplotlib.pyplot as plt

    if ax is None:
        ax = plt.subplot()
    for i, res in enumerate(results):
        if isinstance(res, str):
            res = read_results(res)
        means = mean_over_reps(res)
        label = labels[i] if labels else f"series {i}"
        ax.plot(dims[: len(means)], means, marker="o", label=label)
    ax.set_xlabel("problem dimension n")
    ax.set_ylabel("mean solve time (s)")
    if logy:
        ax.set_yscale("log")
    ax.set_title(title)
    ax.legend()
    return ax
