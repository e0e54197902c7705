"""Run configuration.

Re-provides the reference's three config tiers (SURVEY.md §5 "Config / flag
system"; reference `include/task/task.h:78-170` GNNParam singleton parsing
``key : value`` files, `include/harness.h:25-38` getopt CLI):

  * :class:`GNNParam` — GNN hyperparameters, parsed from the same ``key : value``
    file format as the reference's `GNNParam::readConfig` so the reference's
    `build_from_source/config/*.txt` files work unmodified.
  * :class:`RunConfig` — framework-level knobs (the reference's CLI flags plus
    TPU-native additions: ring width, fixed-point fractional bits, mesh shape).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Tuple


@dataclasses.dataclass
class GNNParam:
    """GNN hyperparameters (reference `task/task.h:78-105`)."""

    num_layers: int = 2
    num_labels: int = 7
    input_dim: int = 1433
    hidden_dim: int = 16
    num_samples: int = 2708
    num_edges: int = 10556
    learning_rate: float = 0.5
    train_ratio: float = 0.2
    val_ratio: float = 0.2
    test_ratio: float = 0.6

    _INT_KEYS = {
        "num_layers",
        "num_labels",
        "input_dim",
        "hidden_dim",
        "num_samples",
        "num_edges",
    }
    _FLOAT_KEYS = {"learning_rate", "train_ratio", "val_ratio", "test_ratio"}

    @classmethod
    def read_config(cls, path: str | Path) -> "GNNParam":
        """Parse a ``key : value`` config file (reference `task/task.h:106-169`).

        Unknown keys are ignored; ``#`` starts a comment.
        """
        param = cls()
        for raw in Path(path).read_text().splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key, value = key.strip(), value.strip()
            if key in cls._INT_KEYS:
                setattr(param, key, int(value))
            elif key in cls._FLOAT_KEYS:
                setattr(param, key, float(value))
        return param

    @property
    def layer_dims(self) -> Tuple[int, ...]:
        """(input_dim, hidden_dim, ..., num_labels) — one entry per layer edge."""
        return (
            self.input_dim,
            *([self.hidden_dim] * (self.num_layers - 1)),
            self.num_labels,
        )


@dataclasses.dataclass
class RunConfig:
    """Framework-level run configuration.

    CLI-equivalent fields mirror the reference's getopt surface
    (`harness.h:25-38`): ``threads``(-t) ``tiles``(-g) ``tile_index``(-i)
    ``max_iters``(-m) ``num_parts``(-p) ``setting``(-s) ``no_preprocess``(-n)
    ``is_cluster``(-c) ``no_dummy_edge``(-r) ``undirected``(-u).

    TPU-native additions configure the numeric layer and the device mesh.
    """

    # --- reference CLI surface ---
    threads: int = 1
    tiles: int = 2  # number of parties ("graph tiles"), -g
    tile_index: int = 0  # this party's index, -i
    max_iters: int = 6
    num_parts: int = 1
    setting: str = "default"
    no_preprocess: bool = False
    is_cluster: bool = False
    no_dummy_edge: bool = False  # -r: pad with >=1 dummy instead of pow2
    undirected: bool = False  # -u: add reverse edges at load

    # positional files (edgelist, vertexlist, partition, output, gnn config)
    edge_file: Optional[str] = None
    vertex_file: Optional[str] = None
    partition_file: Optional[str] = None
    output_file: Optional[str] = None
    gnn_config_file: Optional[str] = None

    # --- TPU-native numeric layer ---
    # Ring width for secret shares: 64 (reference parity, uint64/2-limb) or 32.
    ring_bits: int = 64
    # Fixed-point fractional bits (the reference's SCALER_BIT_LENGTH, an
    # external Task-Worker constant; configurable here).
    scaler_bits: int = 16
    # Exact truncation (reconstruct-shift-reshare; matches plaintext) vs
    # probabilistic local truncation (protocol-faithful).
    exact_truncation: bool = True

    # --- mesh ---
    mesh_shape: Tuple[int, ...] = (1,)
    mesh_axis_names: Tuple[str, ...] = ("party",)

    # variant: "opt" (CoGNN-Opt), "unopt" (CoGNN), "inference" (opt-inference)
    variant: str = "opt"
