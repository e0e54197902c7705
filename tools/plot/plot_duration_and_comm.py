#!/usr/bin/env python
"""Per-epoch duration + per-party communication — reference
`tools/plot/plot_duration_and_comm{_scale}.py` equivalent.

Reads a setting directory (log/<setting>, comm/<setting>) and prints the
per-epoch duration stats per party plus communication volumes; optional bar
figure.

Usage:
  python tools/plot/plot_duration_and_comm.py --setting smallest_efficiency \
      --iters-per-epoch 6 [--out fig.png]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from log_parse import epoch_durations, parse_comm_file, parse_party_log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--setting", required=True)
    ap.add_argument("--log-root", default="log")
    ap.add_argument("--comm-root", default="comm")
    ap.add_argument("--iters-per-epoch", type=int, default=6)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    logdir = Path(args.log_root) / args.setting
    commdir = Path(args.comm_root) / args.setting
    rows = []
    for log in sorted(logdir.glob("gcn_test_*.log")):
        parsed = parse_party_log(log)
        iters = parsed["durations"].get("iteration", [])
        epochs = epoch_durations(iters, args.iters_per_epoch)
        comm = {}
        stem = log.stem.replace("gcn_test_", "")
        cf = commdir / (stem + ".comm")
        if cf.exists():
            comm = parse_comm_file(cf)
        rows.append((log.stem, epochs, comm))
        mean = sum(epochs) / len(epochs) if epochs else float("nan")
        print(f"{log.stem:32s} epochs={len(epochs):4d} "
              f"mean_epoch={mean:9.4f}s "
              f"sent={comm.get('sent_MB', float('nan')):9.2f}MB "
              f"recv={comm.get('recv_MB', float('nan')):9.2f}MB")

    if args.out and rows:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (a1, a2) = plt.subplots(1, 2, figsize=(9, 4))
        names = [r[0] for r in rows]
        means = [sum(r[1]) / len(r[1]) if r[1] else 0 for r in rows]
        sent = [r[2].get("sent_MB", 0) for r in rows]
        a1.bar(names, means)
        a1.set_ylabel("mean epoch duration (s)")
        a1.tick_params(axis="x", rotation=60, labelsize=7)
        a2.bar(names, sent)
        a2.set_ylabel("sent (MB)")
        a2.tick_params(axis="x", rotation=60, labelsize=7)
        fig.tight_layout()
        fig.savefig(args.out, dpi=140)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
