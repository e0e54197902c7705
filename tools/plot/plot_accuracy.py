#!/usr/bin/env python
"""Accuracy curves — reference `tools/plot/plot_accuracy.py` equivalent.

Reads party-0 logs from one or more settings under log/ and plots test +
border-test accuracy per epoch (figure) and prints the final-epoch table.

Usage:
  python tools/plot/plot_accuracy.py log/opt_accuracy_2p/gcn_test_cora_0.log \
      [more logs...] --out accuracy.png
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from log_parse import parse_party_log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logs", nargs="+")
    ap.add_argument("--out", default="accuracy.png")
    ap.add_argument("--series", default="test set",
                    help="accuracy series to plot")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.2))
    print(f"{'log':48s} {'final':>8s} {'best':>8s} {'border':>8s}")
    for path in args.logs:
        parsed = parse_party_log(path)
        series = parsed["accuracy"].get(args.series, [])
        border = parsed["accuracy"].get("border " + args.series, [])
        label = Path(path).parent.name + "/" + Path(path).stem
        if series:
            ax.plot(range(1, len(series) + 1), series, label=label)
            print(f"{label:48s} {series[-1]:8.4f} {max(series):8.4f} "
                  f"{(border[-1] if border else float('nan')):8.4f}")
    ax.set_xlabel("epoch")
    ax.set_ylabel(f"{args.series} accuracy")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=140)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
