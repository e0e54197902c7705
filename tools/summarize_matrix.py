#!/usr/bin/env python
"""Summarize a full evaluation-matrix run into committed markdown tables.

Walks ``log/<setting>/gcn_test_<dataset>_<p>.log`` + ``comm/<setting>/``
(the reference's log layout, written by tools/run_cluster.py) and emits
one accuracy/duration/comm row per (setting, dataset) cell — the
TPU counterpart of the reference's evaluation matrix
(`tools/tmp_run_cluster.py:263-448`), in one reviewable file.

Usage: python tools/summarize_matrix.py [--log-root log] [--comm-root comm]
           [--out results/matrix/SUMMARY.md]
"""

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent / "plot"))
from log_parse import parse_comm_file, parse_party_log  # noqa: E402


def one_cell(logdir: Path, commdir: Path, dataset: str):
    """Aggregate all parties of one (setting, dataset) cell."""
    logs = sorted(logdir.glob(f"gcn_test_{dataset}_*.log"))
    if not logs:
        return None
    acc = {}
    iters = []
    loss = None
    for lg in logs:
        d = parse_party_log(lg)
        for k, v in d["accuracy"].items():
            if v:
                acc.setdefault(k, []).append(v[-1])
        if d["loss"]:
            loss = d["loss"][-1]
        iters.extend(d["durations"].get("iteration", []))
    sent = recv = rounds = nc = 0
    backend = mode = ""
    for cf in sorted(commdir.glob(f"{dataset}_*.comm")):
        c = parse_comm_file(cf)
        sent += c.get("sent_MB", 0) or 0
        recv += c.get("recv_MB", 0) or 0
        try:
            raw = json.loads(Path(cf).read_text())
            rounds += (raw.get("per_epoch_rounds") or {}).get("total", 0)
            backend = raw.get("backend", backend)
            mode = raw.get("mode", mode)
        except Exception:  # noqa: BLE001
            pass
        nc += 1
    mean = lambda xs: sum(xs) / len(xs) if xs else float("nan")  # noqa
    return {
        "parties": len(logs),
        "loss": loss,
        "test_acc": mean(acc.get("test set", [])),
        "border_test_acc": mean(acc.get("border test set", [])),
        "iter_us": mean(iters) * 1e6 if iters else float("nan"),
        "n_iters": len(iters) // max(len(logs), 1),
        "sent_MB": sent / nc if nc else float("nan"),
        "rounds": rounds / nc if nc else float("nan"),
        "backend": backend,
        "mode": mode,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-root", default="log")
    ap.add_argument("--comm-root", default="comm")
    ap.add_argument("--out", default="results/matrix/SUMMARY.md")
    args = ap.parse_args()

    log_root = Path(args.log_root)
    comm_root = Path(args.comm_root)
    rows = []
    for setting_dir in sorted(log_root.iterdir()):
        if not setting_dir.is_dir():
            continue
        setting = setting_dir.name
        datasets = sorted({re.match(r"gcn_test_(.+)_\d+\.log", f.name)[1]
                           for f in setting_dir.glob("gcn_test_*.log")})
        for ds in datasets:
            cell = one_cell(setting_dir, comm_root / setting, ds)
            if cell:
                rows.append((setting, ds, cell))

    lines = [
        "# Evaluation matrix (TPU) — summary",
        "",
        "Produced by `tools/summarize_matrix.py` from the driver outputs "
        "of `tools/run_cluster.py` (one row per (setting, dataset) cell; "
        "accuracy = final epoch, mean over parties; per-iteration time = "
        "mean `::iteration took` span; comm = traced per-party wire "
        "bytes for the sharded deployment of the same run).",
        "",
        "| setting | dataset | P | loss | test acc | border test acc | "
        "us/iter | iters | MB/party | rounds/epoch | sharded backend |",
        "|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for setting, ds, c in rows:
        fmt = lambda v, f="{:.4f}": ("-" if v is None or v != v  # noqa
                                     else f.format(v))
        lines.append(
            f"| {setting} | {ds} | {c['parties']} | {fmt(c['loss'])} | "
            f"{fmt(c['test_acc'])} | {fmt(c['border_test_acc'])} | "
            f"{fmt(c['iter_us'], '{:.1f}')} | {c['n_iters']} | "
            f"{fmt(c['sent_MB'], '{:.2f}')} | "
            f"{fmt(c['rounds'], '{:.0f}')} | {c['backend'] or '-'} |")
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines) + "\n")
    print(f"wrote {out} ({len(rows)} cells)")


if __name__ == "__main__":
    main()
