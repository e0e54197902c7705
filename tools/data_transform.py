#!/usr/bin/env python
"""Dataset transform CLI — reference `tools/data_transform.py` equivalent.

Produces the same output files (``<name>.{vertex,edge}.preprocessed``,
``<name>.part.preprocessed.<p>p`` and the ``<k>s/`` scaler subsets) from
either real pre-downloaded Planetoid raw files (--planetoid-root) or the
built-in synthetic generators (offline default — this environment has no
network egress for the PyG download the reference uses).

Usage:
  python tools/data_transform.py cora --out data/cora/transformed
  python tools/data_transform.py pubmed --by-parts 5 --out data/pubmed
  python tools/data_transform.py cora --planetoid-root data/Cora/raw --out out
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cognn_tpu.harness.datasets import (  # noqa: E402
    DATASET_STATS,
    load_planetoid_raw,
    synthetic_planetoid,
    transform,
    transform_by_parts,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", choices=sorted(DATASET_STATS))
    ap.add_argument("--out", required=True)
    ap.add_argument("--planetoid-root", default=None,
                    help="dir with ind.<name>.* raw files (else synthetic)")
    ap.add_argument("--by-parts", type=int, default=0,
                    help="also emit <k>s scaler subsets (reference mode)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.planetoid_root:
        ds = load_planetoid_raw(args.planetoid_root, args.dataset)
    else:
        ds = synthetic_planetoid(args.dataset, seed=args.seed)
    out = transform(ds, args.out)
    print(f"wrote {sorted(p.name for p in Path(out).iterdir())}")
    if args.by_parts:
        transform_by_parts(ds, args.out, args.by_parts)
        print(f"wrote scaler subsets 2s..{args.by_parts}s")


if __name__ == "__main__":
    main()
