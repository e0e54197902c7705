#!/usr/bin/env python
"""Phase-duration breakdown table + comm table — reference
`tools/plot/plot_duration_breakdown_and_comm.py` equivalent (Tables 7-12
role).

The reference averages each `::<tag> took` span tag over epochs and parties
and prints a markdown table per dataset with a Total column, then a
preprocess/online comm table. Our logs carry the same span format; tags
present here are the compiled-engine phases (graph_load / preprocess /
compile / iteration) — any tag set works, the table adapts.

Usage:
  python tools/plot/plot_duration_breakdown_and_comm.py \
      --setting opt_accuracy_2p --datasets cora citeseer pubmed \
      [--iters-per-epoch 6]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from log_parse import parse_comm_file, parse_party_log  # noqa: E402


def breakdown(logdir: Path, dataset: str, iters_per_epoch: int):
    """mean seconds per epoch for every span tag, averaged over parties."""
    per_tag: dict = {}
    n_parties = 0
    for log in sorted(logdir.glob(f"gcn_test_{dataset}_*.log")):
        n_parties += 1
        durs = parse_party_log(log)["durations"]
        for tag, vals in durs.items():
            if tag == "iteration":
                # per-epoch: sum of iters_per_epoch consecutive spans
                n_epochs = max(len(vals) // iters_per_epoch, 1)
                per_epoch = sum(vals) / n_epochs
            else:
                # one-shot phases (load/preprocess/compile): total
                per_epoch = sum(vals)
            per_tag[tag] = per_tag.get(tag, 0.0) + per_epoch
    out = ({t: v / n_parties for t, v in per_tag.items()}
           if n_parties else {})
    # device-trace per-phase companions (tools/profile_mpc_epoch.py
    # --breakdown-log): reference-granularity per-EPOCH span values for
    # the phases a compiled epoch hides from host timing (Tables 7-12
    # role; `ss_vertex_centric_algo_kernel.h:745-897` tag set)
    for bf in sorted(logdir.glob(f"*{dataset}*.breakdown")):
        for tag, vals in parse_party_log(bf)["durations"].items():
            out[tag] = sum(vals) / len(vals)
    return out


def print_markdown(rows, tags):
    header = ["Dataset"] + tags + ["Total"]
    print("| " + " | ".join(header) + " |")
    print("|" + "---|" * len(header))
    for name, per_tag in rows:
        vals = [per_tag.get(t, float("nan")) for t in tags]
        cells = [name] + [f"{v:.6f}" for v in vals] + [f"{sum(vals):.6f}"]
        print("| " + " | ".join(cells) + " |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--setting", required=True)
    ap.add_argument("--datasets", nargs="+", default=["cora"])
    ap.add_argument("--iters-per-epoch", type=int, default=6)
    ap.add_argument("--log-root", default="log")
    ap.add_argument("--comm-root", default="comm")
    args = ap.parse_args()

    logdir = Path(args.log_root) / args.setting
    rows, tag_set = [], []
    for ds in args.datasets:
        per_tag = breakdown(logdir, ds, args.iters_per_epoch)
        rows.append((ds, per_tag))
        for t in per_tag:
            if t not in tag_set:
                tag_set.append(t)
    print(f"## duration breakdown (s), setting {args.setting}")
    print_markdown(rows, tag_set)

    commdir = Path(args.comm_root) / args.setting
    print(f"\n## communication per party (MB), setting {args.setting}")
    print("| Dataset | sent | recv |")
    print("|---|---|---|")
    for ds in args.datasets:
        sent = recv = cnt = 0
        for cf in sorted(commdir.glob(f"{ds}_*.comm")):
            c = parse_comm_file(cf)
            sent += c.get("sent_MB", 0)
            recv += c.get("recv_MB", 0)
            cnt += 1
        if cnt:
            print(f"| {ds} | {sent / cnt:.2f} | {recv / cnt:.2f} |")
        else:
            print(f"| {ds} | - | - |")


if __name__ == "__main__":
    main()
