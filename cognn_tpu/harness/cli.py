"""CLI argument surface — reference `include/harness.h:25-220` parity.

Flags (same letters as the reference's getopt list):
  -t/--threads, -g/--tiles, -i/--tile-index, -m/--max-iters, -p/--num-parts,
  -s/--setting, -n/--no-preprocess, -c/--cluster, -r/--no-dummy-edge,
  -u/--undirected
Positionals: edgelist vertexlist partition output gnnconfig.

TPU-native extensions: --variant {opt,unopt,inference}, --mpc, --mode
{stacked,sharded}, --epochs, --ring-bits, --scaler-bits, --dtype.

(The reference's `-s` fall-through-into-`-n` getopt bug, `harness.h:140-146`,
is intentionally NOT reproduced — SURVEY.md flags it as benign-by-accident.)
"""

from __future__ import annotations

import argparse

from cognn_tpu.config import RunConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cognn-tpu",
        description="TPU-native collaborative GNN training/inference "
                    "(CoGNN capability rebuild)")
    p.add_argument("-t", "--threads", type=int, default=0,
                   help="native graph-loader thread cap (0 = auto)")
    p.add_argument("-g", "--tiles", type=int, default=2,
                   help="number of parties/graph tiles")
    p.add_argument("-i", "--tile-index", type=int, default=0,
                   help="this party's index (per-party mode)")
    p.add_argument("-m", "--max-iters", type=int, default=6,
                   help="GAS schedule iterations (6 per opt epoch)")
    p.add_argument("-p", "--num-parts", type=int, default=1,
                   help="accepted for reference CLI parity; the reference "
                        "GCN kernels never read numParts either (it feeds "
                        "the vestigial plaintext analytics path, "
                        "algo_kernel.h:82-89)")
    p.add_argument("-s", "--setting", type=str, default="default",
                   help="run setting tag (log/checkpoint naming)")
    p.add_argument("-n", "--no-preprocess", action="store_true",
                   help="reuse cached compiled plan/checkpoint if present")
    p.add_argument("-c", "--cluster", action="store_true",
                   help="multi-host mode (jax.distributed)")
    p.add_argument("-r", "--no-dummy-edge", action="store_true",
                   help="pad only isolated vertices (reference -r mode)")
    p.add_argument("-u", "--undirected", action="store_true",
                   help="add reverse edges at load")
    p.add_argument("edge_file")
    p.add_argument("vertex_file")
    p.add_argument("partition_file")
    p.add_argument("output_file")
    p.add_argument("gnn_config_file")
    # TPU-native extensions
    p.add_argument("--variant",
                   choices=["opt", "unopt", "inference", "unopt-inference",
                            "ss"],
                   default="opt",
                   help="ss = the reference's gcn-ss build: the unopt "
                        "(fused original-style) schedule in share space; "
                        "unopt-inference = the original-gcn forward run "
                        "with maxIters=2 (reference "
                        "tmp_run_cluster.py:417-435)")
    p.add_argument("--mpc", action="store_true",
                   help="secret-shared execution (additive shares, Z_2^64)")
    p.add_argument("--mode", choices=["stacked", "sharded"], default="stacked")
    p.add_argument("--ring-bits", type=int, default=64, choices=[32, 64])
    p.add_argument("--scaler-bits", type=int, default=16,
                   help="fixed-point fractional bits (SCALER_BIT_LENGTH)")
    p.add_argument("--aggregation", default="auto",
                   choices=["auto", "sparse", "dense", "bcsr"],
                   help="aggregation backend, plaintext and mpc (bcsr = "
                        "Pallas block-sparse SpMM; dense = flat MXU "
                        "adjacency; auto = measured-best for the scale)")
    p.add_argument("--reorder", action="store_true",
                   help="BFS-reorder local vertices for aggregation block "
                        "locality (recommended with --aggregation bcsr; "
                        "semantics preserved, outputs mapped back to vids)")
    p.add_argument("--dense-aggregation", action="store_true",
                   help="alias for --aggregation dense")
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="save weights every N epochs (0 = off)")
    p.add_argument("--coordinator", default="127.0.0.1:29400",
                   help="jax.distributed coordinator (cluster mode)")
    p.add_argument("--jax-profile", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of the run")
    return p


def to_run_config(args: argparse.Namespace) -> RunConfig:
    return RunConfig(
        threads=args.threads,
        tiles=args.tiles,
        tile_index=args.tile_index,
        max_iters=args.max_iters,
        num_parts=args.num_parts,
        setting=args.setting,
        no_preprocess=args.no_preprocess,
        is_cluster=args.cluster,
        no_dummy_edge=args.no_dummy_edge,
        undirected=args.undirected,
        edge_file=args.edge_file,
        vertex_file=args.vertex_file,
        partition_file=args.partition_file,
        output_file=args.output_file,
        gnn_config_file=args.gnn_config_file,
        ring_bits=args.ring_bits,
        scaler_bits=args.scaler_bits,
        variant={"inference": "opt_inference",
                 "unopt-inference": "unopt_inference",
                 "ss": "unopt"}.get(args.variant, args.variant),
    )
