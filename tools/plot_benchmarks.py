#!/usr/bin/env python
"""Overlay benchmark CSV time-series across runs for visual regression
comparison — the role of the reference repo's plot_benchmarks.py (repo
root, lines 1-80), which the reference's workflow uses as its regression
test (SURVEY §4.2).

Reads the harness CSV schema `scene;time;primary;extension;shadow;
total;samples` (bench/harness.py, tracer.cpp:676-691) and writes one PNG
per scene with each run's chosen column (default: total MRays/s) plotted
over render time.

Usage:
    python tools/plot_benchmarks.py [run1.csv run2.csv ...]
                                    [--columns total,extension]
                                    [--out-dir plots]

With no arguments, globs *.csv in the current directory.
"""

from __future__ import annotations

import argparse
import csv
import os
from collections import defaultdict
from glob import glob


def read_run(path):
    """-> {scene: {column: [values...]}} for one harness CSV."""
    scenes = defaultdict(lambda: defaultdict(list))
    with open(path, newline="") as f:
        rows = csv.reader(f, delimiter=";")
        header = next(rows)[1:]        # first column is the scene name
        for row in rows:
            if not row:
                continue
            scene = os.path.basename(row[0].replace("\\", "/"))
            for name, value in zip(header, row[1:]):
                scenes[scene][name].append(float(value))
    return scenes


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="*", help="harness CSV files (default: ./*.csv)")
    ap.add_argument("--columns", default="total",
                    help="comma-separated columns to plot (default: total)")
    ap.add_argument("--out-dir", default=".",
                    help="directory for the per-scene PNGs")
    args = ap.parse_args(argv)

    files = args.csvs or sorted(glob("*.csv"))
    if not files:
        ap.error("no CSV files found")
    columns = [c.strip() for c in args.columns.split(",") if c.strip()]

    # label runs by basename stem; fall back to the full path when stems
    # collide (e.g. before/bench.csv vs after/bench.csv) so no run is
    # silently dropped from the overlay
    stems = [os.path.splitext(os.path.basename(p))[0] for p in files]
    runs = {}
    for p, stem in zip(files, stems):
        label = stem if stems.count(stem) == 1 \
            else os.path.splitext(p)[0].replace(os.sep, "/")
        runs[label] = read_run(p)
    scene_names = sorted({s for run in runs.values() for s in run})

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    os.makedirs(args.out_dir, exist_ok=True)
    written = []
    for scene in scene_names:
        fig, ax = plt.subplots(figsize=(8, 4.5))
        ax.set_title(scene)
        for run_name in sorted(runs):
            data = runs[run_name].get(scene)
            if not data:
                continue
            # skip the first sample: it includes compile/warmup skew
            # (the reference plot does the same, plot_benchmarks.py:78)
            for col in columns:
                if col not in data:
                    continue
                ax.plot(data["time"][1:], data[col][1:],
                        label=f"{run_name}: {col}")
        ax.set_xlabel("render time [s]")
        ax.set_ylabel("MRays/s")
        ax.legend(loc="upper left", fontsize=8)
        ax.grid(True, alpha=0.3)
        out = os.path.join(args.out_dir,
                           f"bench_{os.path.splitext(scene)[0]}.png")
        fig.savefig(out, dpi=110, bbox_inches="tight")
        plt.close(fig)
        written.append(out)
        print(f"wrote {out}")
    return written


if __name__ == "__main__":
    main()
