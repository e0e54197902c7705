#!/usr/bin/env python
"""Accuracy curves for varying numbers of graph owners — reference
`tools/plot/plot_accuracy_various_graph_num.py` equivalent.

For one setting prefix, overlays the per-epoch test (left panel) and
border-test (right panel) accuracy trajectories for each party count —
each curve averaged over that run's parties — so the effect of splitting
the graph across more owners is visible across whole trainings.

Usage:
  python tools/plot/plot_accuracy_various_graph_num.py \
      --prefix opt_accuracy --dataset cora --parties 2 3 4 5 \
      [--epochs 90] [--out curves.png]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from log_parse import parse_party_log  # noqa: E402

TEST = "test set"
BORDER = "border test set"


def curves(logdir: Path, dataset: str, epochs: int | None):
    """per-epoch (test, border) accuracy, averaged over the run's parties."""
    test_runs, border_runs = [], []
    for log in sorted(logdir.glob(f"gcn_test_{dataset}_*.log")):
        acc = parse_party_log(log)["accuracy"]
        if acc.get(TEST):
            test_runs.append(acc[TEST][:epochs])
        if acc.get(BORDER):
            border_runs.append(acc[BORDER][:epochs])

    def mean(runs):
        if not runs:
            return []
        n = min(len(r) for r in runs)
        return [sum(r[i] for r in runs) / len(runs) for i in range(n)]

    return mean(test_runs), mean(border_runs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", default="opt_accuracy")
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--parties", type=int, nargs="+", default=[2, 3, 4, 5])
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--log-root", default="log")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    root = Path(args.log_root)
    series = {}
    for k in args.parties:
        t, b = curves(root / f"{args.prefix}_{k}p", args.dataset,
                      args.epochs)
        series[k] = (t, b)
        if t:
            print(f"{k} parties: epochs={len(t)} "
                  f"final test={t[-1]:.4f} border={b[-1] if b else float('nan'):.4f}")
        else:
            print(f"{k} parties: no logs under "
                  f"{root / f'{args.prefix}_{k}p'}")

    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (a1, a2) = plt.subplots(1, 2, figsize=(10, 4))
        for k, (t, b) in series.items():
            if t:
                a1.plot(t, label=f"{k} owners")
            if b:
                a2.plot(b, label=f"{k} owners")
        a1.set_title(f"Test Accuracy ({args.dataset})")
        a2.set_title(f"Border Test Accuracy ({args.dataset})")
        for a in (a1, a2):
            a.set_xlabel("Epoch")
            a.set_ylabel("Accuracy")
            a.legend()
        fig.tight_layout()
        fig.savefig(args.out, dpi=140)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
