#!/usr/bin/env python
"""Experiment: dense zipf-head (hot/cold) split size scan on real TPU.

Scans ``n_hot`` for the headline WRMF sweep (bench.py problem shape) to
find the optimal head size; prints one line per config to stderr.

Usage: python scripts/exp_hot.py [n_hot ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [0, 1024, 2048, 4096, 8192]
    csr = bench.synth_ml20m_like()
    bench.log(f"problem: {csr.shape} nnz={csr.nnz}")
    for n_hot in sizes:
        try:
            bench.measure_sweep(csr, bench.RANK, 5, n_hot=n_hot)
        except Exception as e:  # noqa: BLE001
            bench.log(f"n_hot={n_hot} failed: {e}")


if __name__ == "__main__":
    main()
