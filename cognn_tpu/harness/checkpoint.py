"""Checkpoint / resume.

The reference has NO model checkpointing (SURVEY.md §5) — it only persists
OEP/OT preprocessing material reusable via ``-n``. We keep the ``-n`` flag's
meaning (skip redoable work) and add what a production framework needs:
weight checkpointing with atomic writes, plus the jit compilation cache.

Plaintext engines save per-party weight replicas; MPC engines save the SHARE
pairs (so resuming never materializes plaintext weights on disk). In
multi-process cluster mode (one OS process per party, the reference's
process model `harness.cpp:144-167`) each process writes/reads its OWN
party's shard under ``<ckpt>/party<i>/`` — a global ``np.asarray`` would
touch non-addressable shards.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

import numpy as np


def _is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def _local_np(w) -> np.ndarray:
    """Host copy of ``w`` — the full array when addressable, else this
    process's shard."""
    if getattr(w, "is_fully_addressable", True):
        return np.asarray(w)
    return np.asarray(w.addressable_shards[0].data)


def _party_dir(ckpt_dir: Path) -> Path:
    if _is_multiprocess():
        import jax

        return ckpt_dir / f"party{jax.process_index()}"
    return ckpt_dir


def save(engine, ckpt_dir: str | Path, epoch: int) -> Path:
    ckpt_dir = _party_dir(Path(ckpt_dir))
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    is_mpc = hasattr(engine, "weights_sh")
    weights = engine.weights_sh if is_mpc else engine.weights
    arrays = {f"w{i}": _local_np(w) for i, w in enumerate(weights)}
    meta = {"epoch": epoch, "mpc": is_mpc, "num_layers": len(arrays),
            "multiprocess": _is_multiprocess()}
    fd, tmp = tempfile.mkstemp(dir=ckpt_dir, suffix=".tmp")
    os.close(fd)
    np.savez(tmp, **arrays)  # np.savez appends .npz
    os.replace(tmp + ".npz", ckpt_dir / "weights.npz")
    os.unlink(tmp)
    (ckpt_dir / "meta.json").write_text(json.dumps(meta))
    return ckpt_dir / "weights.npz"


def try_restore(engine, ckpt_dir: str | Path) -> bool:
    ckpt_dir = _party_dir(Path(ckpt_dir))
    wfile, mfile = ckpt_dir / "weights.npz", ckpt_dir / "meta.json"
    if not (wfile.exists() and mfile.exists()):
        return False
    import jax
    import jax.numpy as jnp

    meta = json.loads(mfile.read_text())
    data = np.load(wfile)
    is_mpc = hasattr(engine, "weights_sh")
    if meta["mpc"] != is_mpc:
        raise ValueError("checkpoint mode (mpc/plaintext) mismatch")
    target = engine.weights_sh if is_mpc else engine.weights
    if len(target) != meta["num_layers"]:
        raise ValueError("checkpoint layer count mismatch")
    raw = [data[f"w{i}"] for i in range(meta["num_layers"])]
    if meta.get("multiprocess"):
        if not _is_multiprocess():
            raise ValueError("per-party shard checkpoint needs cluster mode")
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(None, None, "party") if is_mpc else P("party")
        sharding = NamedSharding(engine.mesh, spec)
        restored = [jax.make_array_from_process_local_data(sharding, r)
                    for r in raw]
    else:
        restored = [jnp.asarray(r) for r in raw]
    for i, (cur, new) in enumerate(zip(target, restored)):
        if cur.shape != new.shape:
            raise ValueError(
                f"layer {i} shape mismatch: {cur.shape} vs {new.shape}")
    if is_mpc:
        engine.weights_sh = restored
    else:
        engine.weights = restored
    return True
