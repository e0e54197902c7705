#!/usr/bin/env python
"""Final accuracy vs #parties, CoGNN-Opt / FedGNN / Plaintext — reference
`tools/plot/plot_multiparty_accuracy.py` equivalent (Figure "multi-party
accuracy" role).

For each party count, averages the LAST-epoch test and border-test accuracy
over the parties' logs in `log/<prefix>_<k>p/`; the plaintext baseline is one
horizontal line from `log/plaintext/`. Prints the comparison table and draws
the two-panel (test / border-test) figure.

Usage (after `tools/run_cluster.py --cognn-opt-accuracy --fedgnn
--plaintext`):
  python tools/plot/plot_multiparty_accuracy.py --dataset cora \
      --parties 2 3 4 5 [--out mp_acc.png]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from log_parse import parse_party_log  # noqa: E402

TEST = "test set"
BORDER = "border test set"


def final_accuracy(logdir: Path, dataset: str):
    """(mean last-epoch test acc, mean last-epoch border acc) over parties."""
    test, border = [], []
    for log in sorted(logdir.glob(f"gcn_test_{dataset}_*.log")):
        acc = parse_party_log(log)["accuracy"]
        if acc.get(TEST):
            test.append(acc[TEST][-1])
        if acc.get(BORDER):
            border.append(acc[BORDER][-1])
    mean = lambda xs: sum(xs) / len(xs) if xs else float("nan")  # noqa: E731
    return mean(test), mean(border)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--parties", type=int, nargs="+", default=[2, 3, 4, 5])
    ap.add_argument("--cognn-prefix", default="opt_accuracy")
    ap.add_argument("--fedgnn-prefix", default="fedgnn")
    ap.add_argument("--plaintext-setting", default="plaintext")
    ap.add_argument("--log-root", default="log")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    root = Path(args.log_root)
    series = {}
    for name, prefix in (("CoGNN-Opt", args.cognn_prefix),
                         ("FedGNN", args.fedgnn_prefix)):
        t, b = [], []
        for k in args.parties:
            tt, bb = final_accuracy(root / f"{prefix}_{k}p", args.dataset)
            t.append(tt)
            b.append(bb)
        series[name] = (t, b)
    plain_t, plain_b = final_accuracy(root / args.plaintext_setting,
                                      args.dataset)

    print(f"dataset {args.dataset}: plaintext test={plain_t:.4f} "
          f"border={plain_b:.4f}")
    print("| parties | " + " | ".join(
        f"{n} test | {n} border" for n in series) + " |")
    print("|" + "---|" * (1 + 2 * len(series)))
    for i, k in enumerate(args.parties):
        cells = [str(k)]
        for t, b in series.values():
            cells += [f"{t[i]:.4f}", f"{b[i]:.4f}"]
        print("| " + " | ".join(cells) + " |")
    for name, (t, b) in series.items():
        print(f"{name} - plaintext (last party count): "
              f"test {t[-1] - plain_t:+.4f}, border {b[-1] - plain_b:+.4f}")

    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (a1, a2) = plt.subplots(1, 2, figsize=(10, 4))
        x = [str(k) for k in args.parties]
        for name, (t, b) in series.items():
            a1.plot(x, t, marker="o", label=name)
            a2.plot(x, b, marker="o", label=name)
        if plain_t == plain_t:
            a1.axhline(plain_t, ls="--", color="gray", label="Plaintext")
            a2.axhline(plain_b, ls="--", color="gray", label="Plaintext")
        a1.set_title("Test Accuracy")
        a2.set_title("Border Test Accuracy")
        for a in (a1, a2):
            a.set_xlabel("Number of Parties")
            a.set_ylabel("Accuracy")
            a.legend()
        fig.tight_layout()
        fig.savefig(args.out, dpi=140)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
