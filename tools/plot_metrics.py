"""Render training-curve PNGs from a train-loop metrics CSV.

Reads the CsvLogger output (ocflow_tpu/train/loop.py) and writes a
two-panel figure — EPE vs step (train + val) over a log-scaled y, and
total loss vs step — used for the round evidence in PERF.md/ROUNDLOG.

    python tools/plot_metrics.py results/longrun/metrics.csv out.png
"""

import csv
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e4e3df"
BLUE = "#2a78d6"   # categorical slot 1: train
ORANGE = "#eb6834"  # categorical slot 2: val


def load(path):
    rows = list(csv.DictReader(open(path)))
    out = {}
    for phase in ("train", "val"):
        sel = [r for r in rows if r["phase"] == phase]
        out[phase] = {
            "step": [int(r["step"]) for r in sel],
            **{
                k: [float(r[k]) for r in sel]
                for k in sel[0]
                if k not in ("phase", "step", "epoch") and sel[0][k] != ""
            },
        }
    return out


def style(ax, title):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=INK, fontsize=11, loc="left", pad=8)
    ax.grid(True, axis="y", color=GRID, linewidth=0.8)
    ax.tick_params(colors=INK2, labelsize=9)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.set_xlabel("step", color=INK2, fontsize=9)


def main(csv_path, out_path, title=None):
    d = load(csv_path)
    fig, (ax1, ax2) = plt.subplots(
        2, 1, figsize=(7.2, 5.6), dpi=150, sharex=True,
        facecolor=SURFACE, gridspec_kw={"hspace": 0.38})

    has_epe = "epe" in d["train"]
    if has_epe:
        ax1.plot(d["train"]["step"], d["train"]["epe"], color=BLUE,
                 linewidth=2, label="train")
        if d["val"]["step"]:
            ax1.plot(d["val"]["step"], d["val"]["epe"], color=ORANGE,
                     linewidth=2, label="val")
        ax1.set_yscale("log")
        style(ax1, "End-point error (px, log scale)")
        ax1.legend(frameon=False, labelcolor=INK2, fontsize=9)
        # direct label on the last points
        ax1.annotate(f'{d["train"]["epe"][-1]:.2f}',
                     (d["train"]["step"][-1], d["train"]["epe"][-1]),
                     textcoords="offset points", xytext=(4, 4),
                     color=INK2, fontsize=9)

    ax2.plot(d["train"]["step"], d["train"]["loss"], color=BLUE, linewidth=2,
             label="train")
    if d["val"]["step"] and "loss" in d["val"]:
        ax2.plot(d["val"]["step"], d["val"]["loss"], color=ORANGE,
                 linewidth=2, label="val")
    style(ax2, "Total loss")
    ax2.legend(frameon=False, labelcolor=INK2, fontsize=9)

    if title:
        fig.suptitle(title, color=INK, fontsize=12, x=0.02, ha="left")
    fig.savefig(out_path, bbox_inches="tight", facecolor=SURFACE)
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
