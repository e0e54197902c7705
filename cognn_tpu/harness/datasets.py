"""Dataset generation/loading.

The reference's pipeline pulls Planetoid via torch_geometric and shuffles it
(`tools/data_transform.py`); this environment has no network egress and no
torch_geometric, so we provide:

  * :func:`synthetic_planetoid` — deterministic synthetic graphs with the same
    (n, m, f, c) statistics as Cora/CiteSeer/PubMed and label-homophilous
    structure so GCN training behaves comparably;
  * :func:`load_planetoid_raw` — loader for pre-downloaded PyG ``Planetoid``
    raw files if a user drops them on disk;
  * :func:`transform` — the reference's file-format writer (vertex/edge/part
    files, `tools/data_transform.py:19-65`).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict

import numpy as np

from cognn_tpu.config import GNNParam

# (num_samples, num_directed_edges, input_dim, num_labels, lr, train/val/test)
DATASET_STATS: Dict[str, tuple] = {
    "cora": (2708, 10556, 1433, 7, 0.5, (0.2, 0.2, 0.6)),
    "citeseer": (3312, 10016, 3703, 6, 0.8, (0.2, 0.2, 0.6)),
    "pubmed": (19717, 128146, 500, 3, 8.0, (0.05, 0.15, 0.8)),
    "cora_small": (64, 256, 16, 3, 0.5, (0.2, 0.2, 0.6)),
}


@dataclasses.dataclass
class Dataset:
    name: str
    src: np.ndarray
    dst: np.ndarray
    features: np.ndarray
    labels: np.ndarray
    param: GNNParam


def gnn_param_for(name: str, hidden_dim: int = 16,
                  num_layers: int = 2) -> GNNParam:
    n, m, f, c, lr, (tr, va, te) = DATASET_STATS[name]
    return GNNParam(num_layers=num_layers, num_labels=c, input_dim=f,
                    hidden_dim=hidden_dim, num_samples=n, num_edges=m,
                    learning_rate=lr, train_ratio=tr, val_ratio=va,
                    test_ratio=te)


def synthetic_planetoid(name: str, seed: int = 0,
                        homophily: float = 0.85) -> Dataset:
    """Synthetic dataset with the named Planetoid's statistics."""
    n, m, f, c, lr, _ = DATASET_STATS[name]
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, c, n)
    # sample undirected edges with label homophily
    target_pairs = m // 2
    src_list, dst_list = [], []
    seen = set()
    trials = 0
    # src_list counts directed edges (2 per accepted pair)
    while len(src_list) < 2 * target_pairs and trials < 100 * target_pairs:
        trials += 1
        u = int(rng.integers(0, n))
        if rng.random() < homophily:
            # pick a same-label partner
            v = int(rng.integers(0, n))
            if labels[v] != labels[u]:
                continue
        else:
            v = int(rng.integers(0, n))
        if u == v or (u, v) in seen:
            continue
        seen.add((u, v))
        seen.add((v, u))
        src_list += [u, v]
        dst_list += [v, u]
    src = np.array(src_list, np.int64)
    dst = np.array(dst_list, np.int64)
    # sparse bag-of-words-like features with label signal. Feature scale is
    # tuned so each dataset behaves under ITS reference learning rate:
    # PubMed (lr=8.0, TF-IDF in the original) gets row-normalized rows;
    # Cora/CiteSeer (lr<=0.8, binary BoW) keep unit entries.
    feats = (rng.random((n, f)) < 0.015).astype(np.float64)
    sig = min(8, f)
    block = (labels[:, None] * sig + np.arange(sig)[None, :]) % f
    feats[np.arange(n)[:, None], block] += 1.0
    if name == "pubmed":
        feats /= np.maximum(feats.sum(axis=1, keepdims=True), 1.0)
    return Dataset(name, src, dst, feats, labels, gnn_param_for(name))


def load_planetoid_raw(root: str | Path, name: str) -> Dataset:
    """Load pre-downloaded PyG Planetoid raw pickles (``ind.<name>.*``).

    Standard Planetoid loading semantics (reference pipeline:
    `tools/data_transform.py` via torch_geometric): features =
    vstack(allx, tx) with the shuffled test rows put back in ``test.index``
    order; gap-filled zero rows for test ids missing from ``tx`` (the
    CiteSeer quirk); edges from the symmetric adjacency dict, deduplicated,
    self-loops dropped. Round-trip-tested against locally generated
    fixtures in tests/test_harness.py (no network egress needed)."""
    import pickle

    root = Path(root)
    nm = name.lower()

    def read(which):
        p = root / f"ind.{nm}.{which}"
        with open(p, "rb") as fh:
            return pickle.load(fh, encoding="latin1")

    x, tx, allx = read("x"), read("tx"), read("allx")
    y, ty, ally = read("y"), read("ty"), read("ally")
    graph = read("graph")
    test_idx = np.loadtxt(root / f"ind.{nm}.test.index", dtype=np.int64)
    test_sorted = np.sort(test_idx)

    import scipy.sparse as sp  # type: ignore

    lo, hi = int(test_sorted[0]), int(test_sorted[-1])
    if len(test_idx) != hi - lo + 1:
        # test ids with gaps (CiteSeer): extend tx/ty with zero rows so the
        # positional vstack below covers the full range
        full = hi - lo + 1
        tx_ext = sp.lil_matrix((full, x.shape[1]), dtype=np.float64)
        tx_ext[test_sorted - lo] = tx
        tx = tx_ext
        ty_ext = np.zeros((full, y.shape[1]), ty.dtype)
        ty_ext[test_sorted - lo] = ty
        ty = ty_ext

    feats = sp.vstack([allx, tx]).tolil()
    feats[test_idx] = feats[np.sort(test_idx)]
    labels_oh = np.vstack([ally, ty])
    labels_oh[test_idx] = labels_oh[np.sort(test_idx)]
    labels = labels_oh.argmax(1)
    n = feats.shape[0]
    pairs = {(int(u), int(v)) for u, nbrs in graph.items() for v in nbrs
             if u != v and u < n and v < n}
    pairs |= {(v, u) for (u, v) in pairs}  # dict is normally symmetric
    src, dst = map(np.array, zip(*sorted(pairs)))
    param = gnn_param_for(name)
    param.num_samples = n
    param.num_edges = len(src)
    param.input_dim = x.shape[1]
    param.num_labels = y.shape[1]
    return Dataset(name, src.astype(np.int64), dst.astype(np.int64),
                   np.asarray(feats.todense(), np.float64), labels, param)


def transform(ds: Dataset, out_dir: str | Path, partitions=(2, 3, 4, 5),
              shuffle_seed: int = 42) -> Path:
    """Write the reference's preprocessed file formats
    (`tools/data_transform.py:29-65`): shuffled vertex ids, vertex/edge files,
    round-robin partition files."""
    from cognn_tpu.graph import (write_edge_list, write_partition_file,
                                 write_vertex_file)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = len(ds.features)
    rng = np.random.default_rng(shuffle_seed)
    perm = rng.permutation(n)  # new id of old vertex i is inv[i]
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    name = ds.name.lower()
    write_vertex_file(out / f"{name}.vertex.preprocessed", np.arange(n),
                      ds.features[perm], ds.labels[perm])
    write_edge_list(out / f"{name}.edge.preprocessed", inv[ds.src],
                    inv[ds.dst])
    for p in partitions:
        write_partition_file(out / f"{name}.part.preprocessed.{p}p",
                             {v: v % p for v in range(n)})
    write_config(ds, out)
    return out


def write_config(ds: Dataset, out_dir: str | Path,
                 hidden_dim: int = 16) -> Path:
    """Emit the GNN config in the reference's ``key : value`` format
    (`build_from_source/config/*.txt`)."""
    p = ds.param
    out = Path(out_dir) / f"{ds.name.lower()}_config.txt"
    out.write_text(
        f"num_layers : {p.num_layers}\n"
        f"num_labels : {p.num_labels}\n"
        f"input_dim : {p.input_dim}\n"
        f"hidden_dim : {hidden_dim}\n"
        f"num_samples : {p.num_samples}\n"
        f"num_edges : {p.num_edges}\n"
        f"learning_rate : {p.learning_rate}\n"
        f"train_ratio : {p.train_ratio}\n"
        f"val_ratio : {p.val_ratio}\n"
        f"test_ratio : {p.test_ratio}\n")
    return out


def scaler_subset(ds: Dataset, k: int, num_parts: int = 5,
                  shuffle_seed: int = 42):
    """The reference's "scaler" subset ``ks`` as an in-memory dataset
    (`tools/data_transform.py:67-139`): vertices shuffled (fixed seed)
    then split into ``num_parts`` contiguous blocks; subset = first k
    blocks, edges filtered to both-endpoints-inside, party = block index.
    Returns ``(sub_dataset, tid_map)``. This is the SAME computation
    :func:`transform_by_parts` writes to ``<k>s/`` files, so driver runs
    and file-based runs cannot drift."""
    n = len(ds.features)
    rng = np.random.default_rng(shuffle_seed)
    perm = rng.permutation(n)
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    feats, labels = ds.features[perm], ds.labels[perm]
    src, dst = inv[ds.src], inv[ds.dst]
    bounds = np.array_split(np.arange(n), num_parts)
    sub_n = sum(len(b) for b in bounds[:k])
    keep = (src < sub_n) & (dst < sub_n)
    tid = {}
    off = 0
    for bi, b in enumerate(bounds[:k]):
        for v in range(off, off + len(b)):
            tid[v] = bi
        off += len(b)
    sub = dataclasses.replace(ds, src=src[keep], dst=dst[keep],
                              features=feats[:sub_n],
                              labels=labels[:sub_n])
    return sub, tid


def transform_by_parts(ds: Dataset, out_dir: str | Path,
                       num_parts: int = 5, shuffle_seed: int = 42) -> Path:
    """The reference's "scaler" subsets for efficiency scaling evals
    (`tools/data_transform.py:67-139`), written as
    ``<out>/<k>s/<name>.{vertex,edge,part}.preprocessed`` — the file twin
    of :func:`scaler_subset`."""
    from cognn_tpu.graph import (write_edge_list, write_partition_file,
                                 write_vertex_file)

    out = Path(out_dir)
    name = ds.name.lower()
    for i in range(2, num_parts + 1):
        sub_ds, part = scaler_subset(ds, i, num_parts, shuffle_seed)
        sub = out / f"{i}s"
        sub.mkdir(parents=True, exist_ok=True)
        write_vertex_file(sub / f"{name}.vertex.preprocessed",
                          np.arange(len(sub_ds.features)),
                          sub_ds.features, sub_ds.labels)
        write_edge_list(sub / f"{name}.edge.preprocessed", sub_ds.src,
                        sub_ds.dst)
        write_partition_file(sub / f"{name}.part.preprocessed", part)
    return out


def strip_cross_edges(src: np.ndarray, dst: np.ndarray,
                      tid_of: Dict[int, int]):
    """Keep only intra-party edges — the FedGNN baseline's local graphs
    (reference Task-Worker `fed_gcn.cpp` per README.md:101)."""
    keep = np.array([tid_of[int(u)] == tid_of[int(v)]
                     for u, v in zip(src, dst)])
    return src[keep], dst[keep]
