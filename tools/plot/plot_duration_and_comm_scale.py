#!/usr/bin/env python
"""Per-epoch duration & per-party communication vs #parties — reference
`tools/plot/plot_duration_and_comm_scale.py` equivalent (Figure 6/7 role).

Reads one setting directory per party count (the reference reads
`<app>/log/<exe>/<dataset>/<k>s/...`; our driver writes
`log/<prefix>_<k>{p|s}/gcn_test_<dataset>_<p>.log`), averages the per-epoch
duration over parties, pairs it with the analytic comm accounting, prints the
growth/ratio tables the reference prints, and draws the two-panel line plot.

Usage:
  python tools/plot/plot_duration_and_comm_scale.py \
      --prefix opt_efficiency --suffix s --parties 2 3 4 5 \
      --dataset cora --iters-per-epoch 6 [--out scale.png]
Compare several variants in one figure by passing --prefix more than once.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from log_parse import epoch_durations, parse_comm_file, parse_party_log  # noqa: E402


def collect(prefix, suffix, parties, dataset, iters_per_epoch,
            log_root, comm_root):
    """-> (mean epoch duration per party count, comm MB per party count)."""
    durations, comms = [], []
    for k in parties:
        setting = f"{prefix}_{k}{suffix}"
        logdir = Path(log_root) / setting
        per_party = []
        for log in sorted(logdir.glob(f"gcn_test_{dataset}_*.log")):
            iters = parse_party_log(log)["durations"].get("iteration", [])
            epochs = epoch_durations(iters, iters_per_epoch)
            if epochs:
                per_party.append(sum(epochs) / len(epochs))
        durations.append(sum(per_party) / len(per_party)
                         if per_party else float("nan"))
        sent = []
        for cf in sorted((Path(comm_root) / setting).glob(
                f"{dataset}_*.comm")):
            c = parse_comm_file(cf)
            sent.append(c.get("sent_MB", 0) + c.get("recv_MB", 0))
        comms.append(sum(sent) / len(sent) if sent else float("nan"))
    return durations, comms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", action="append", required=True,
                    help="setting prefix, e.g. opt_efficiency (repeatable)")
    ap.add_argument("--suffix", default="s", choices=["s", "p"],
                    help="scaler runs use <k>s, accuracy runs <k>p")
    ap.add_argument("--parties", type=int, nargs="+", default=[2, 3, 4, 5])
    ap.add_argument("--dataset", default="cora")
    ap.add_argument("--iters-per-epoch", type=int, default=6)
    ap.add_argument("--log-root", default="log")
    ap.add_argument("--comm-root", default="comm")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    series = {}
    for prefix in args.prefix:
        d, c = collect(prefix, args.suffix, args.parties, args.dataset,
                       args.iters_per_epoch, args.log_root, args.comm_root)
        series[prefix] = (d, c)
        print(f"{prefix}: epoch duration (s) per #parties "
              f"{dict(zip(args.parties, [round(x, 4) for x in d]))}")
        print(f"{prefix}: comm per party (MB)        "
              f"{dict(zip(args.parties, [round(x, 2) for x in c]))}")
        if d and d[0] and d[0] == d[0]:
            print(f"{prefix}: duration growth {args.parties[-1]}p/"
                  f"{args.parties[0]}p = {d[-1] / d[0]:.2f}")
    names = list(series)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            di, dj = series[names[i]][0], series[names[j]][0]
            ratio = [a / b if b else float("nan") for a, b in zip(di, dj)]
            print(f"duration {names[i]} / {names[j]}: "
                  f"{[round(r, 2) for r in ratio]}")

    if args.out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (a1, a2) = plt.subplots(1, 2, figsize=(9, 4))
        x = [str(p) for p in args.parties]
        for name, (d, c) in series.items():
            a1.plot(x, d, marker="o", label=name)
            a2.plot(x, c, marker="o", label=name)
        a1.set_xlabel("Number of Graph Owners")
        a1.set_ylabel("Duration per Epoch [s]")
        a2.set_xlabel("Number of Graph Owners")
        a2.set_ylabel("Comm per Party [MB]")
        for a in (a1, a2):
            a.legend()
        fig.tight_layout()
        fig.savefig(args.out, dpi=140)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
