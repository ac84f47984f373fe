"""Render a run directory's chart spec to a PNG dashboard.

The reference streams metrics to an ml_dash server and renders its
`.charts.yml` in a web dashboard (reference scripts/train.py:227-253);
here every run dir already carries the same spec next to metrics.jsonl,
and this CLI turns them into a single dashboard image for offline
inspection (each panel is one metric = one series, so identity is
carried by the panel title, not color).

Usage: python scripts/plot_run.py RUN_DIR [RUN_DIR ...] [--out charts.png]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_spec(run_dir):
    keys = []
    path = os.path.join(run_dir, ".charts.yml")
    if os.path.exists(path):
        for line in open(path):
            line = line.strip()
            if line.startswith("- yKey:"):
                keys.append(line.split(":", 1)[1].strip())
    return keys


def plot_run(run_dir, out=None):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    rows = [json.loads(l) for l in open(os.path.join(run_dir,
                                                     "metrics.jsonl"))]
    keys = load_spec(run_dir) or sorted(
        {k for r in rows for k in r if k.startswith("train/")})[:12]
    keys = [k for k in keys if any(k in r for r in rows)]
    if not keys:
        print(f"{run_dir}: no plottable keys")
        return None
    ncols = 3
    nrows = -(-len(keys) // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(4.2 * ncols, 2.6 * nrows), dpi=110)
    axes = list(axes.flat) if hasattr(axes, "flat") else [axes]
    ink = "#30343a"          # single-series line ink (text-adjacent, calm)
    grid = "#d9dde3"         # recessive grid
    for ax, key in zip(axes, keys):
        xs = [r["iterations"] for r in rows if key in r]
        ys = [r[key] for r in rows if key in r]
        ax.plot(xs, ys, color=ink, linewidth=1.4)
        ax.set_title(key, fontsize=8, loc="left")
        ax.grid(True, color=grid, linewidth=0.6)
        ax.tick_params(labelsize=7)
        for spine in ("top", "right"):
            ax.spines[spine].set_visible(False)
    for ax in axes[len(keys):]:
        ax.set_visible(False)
    fig.suptitle(run_dir, fontsize=10, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.97))
    out = out or os.path.join(run_dir, "charts.png")
    fig.savefig(out)
    plt.close(fig)
    print(f"saved {out}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--out", default=None,
                    help="output path (only with a single run dir)")
    a = ap.parse_args()
    for d in a.run_dirs:
        plot_run(d, a.out if len(a.run_dirs) == 1 else None)


if __name__ == "__main__":
    main()
