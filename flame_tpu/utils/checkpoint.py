"""Checkpoint/resume for the full pipeline state.

The reference has no checkpointing at all (SURVEY.md section 5: all state
is in-memory; clear() is the only lifecycle op). Here every piece of
pipeline state is already array-shaped (SoA + masks), so a checkpoint is a
flat dict of numpy arrays + a small JSON-able header, saved with numpy's
npz container. Orbax is available in the environment but npz keeps
checkpoints dependency-free and trivially inspectable.
"""

import json
import os
from typing import Dict

import numpy as np
import jax.numpy as jnp


def _flatten(prefix: str, tree) -> Dict[str, np.ndarray]:
    out = {}
    if hasattr(tree, "_asdict"):
        for k, v in tree._asdict().items():
            if v is None:
                continue
            out.update(_flatten(f"{prefix}.{k}", v))
    else:
        out[prefix] = np.asarray(tree)
    return out


def save(path: str, fl) -> None:
    """Snapshot a Flame instance to <path> (.npz)."""
    arrays: Dict[str, np.ndarray] = {}
    arrays.update(_flatten("feats", fl._feats))
    arrays.update(_flatten("curr", fl._curr))
    arrays.update(_flatten("graph", fl._graph))
    arrays.update(_flatten("stack", fl._stack))
    arrays["tris"] = np.asarray(fl._tris)
    arrays["tri_mask"] = np.asarray(fl._tri_mask)
    arrays["tri_validity"] = np.asarray(fl._tri_validity)
    arrays["vtx_idepths"] = np.asarray(fl._vtx_idepths)
    arrays["vtx_normals"] = np.asarray(fl._vtx_normals)
    arrays["idepthmap"] = np.asarray(fl._idepthmap)
    arrays["edges_np"] = fl._edges_np

    header = {
        "width": fl.width, "height": fl.height,
        "inited": fl.inited, "num_imgs": fl.num_imgs,
        "num_data_updates": fl.num_data_updates,
        "num_regularizer_updates": fl.num_regularizer_updates,
        "graph_scale": float(np.asarray(fl._graph_scale_dev)),
        "n_edges": fl._n_edges, "n_tris": fl._n_tris,
        "pf_slot_by_id": {str(k): int(v)
                          for k, v in fl._pf_slot_by_id.items()},
        "curr_pf_slot": fl._curr_pf_slot,
        "feat_id_counter": fl._feat_id_counter,
    }
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load(path: str, fl) -> None:
    """Restore a Flame instance in place from a snapshot.

    The instance must have been constructed with the same Params
    (capacities/shapes must match).
    """
    data = np.load(path)
    header = json.loads(bytes(data["__header__"]).decode())
    assert header["width"] == fl.width and header["height"] == fl.height, \
        "checkpoint resolution mismatch"

    def unflat(prefix, proto):
        kwargs = {}
        for k, v in proto._asdict().items():
            key = f"{prefix}.{k}"
            if v is None:
                kwargs[k] = None
            elif hasattr(v, "_asdict"):
                kwargs[k] = unflat(key, v)
            else:
                arr = data[key]
                assert arr.shape == tuple(v.shape), \
                    f"{key}: {arr.shape} vs {v.shape}"
                kwargs[k] = jnp.asarray(arr)
        return type(proto)(**kwargs)

    fl._feats = unflat("feats", fl._feats)
    fl._curr = unflat("curr", fl._curr)
    fl._graph = unflat("graph", fl._graph)
    fl._stack = unflat("stack", fl._stack)
    fl._tris = jnp.asarray(data["tris"])
    fl._tri_mask = jnp.asarray(data["tri_mask"])
    fl._tri_validity = jnp.asarray(data["tri_validity"])
    fl._vtx_idepths = jnp.asarray(data["vtx_idepths"])
    fl._vtx_normals = jnp.asarray(data["vtx_normals"])
    fl._idepthmap = jnp.asarray(data["idepthmap"])
    fl._edges_np = data["edges_np"]

    fl.inited = bool(header["inited"])
    fl.num_imgs = int(header["num_imgs"])
    fl.num_data_updates = int(header["num_data_updates"])
    fl.num_regularizer_updates = int(header["num_regularizer_updates"])
    fl._graph_scale_dev = jnp.float32(header["graph_scale"])
    fl._n_edges = int(header["n_edges"])
    fl._n_tris = int(header["n_tris"])
    fl._pf_slot_by_id = {int(k): int(v)
                         for k, v in header["pf_slot_by_id"].items()}
    fl._curr_pf_slot = header["curr_pf_slot"]
    fl._feat_id_counter = int(header.get("feat_id_counter", 0))
    used = set(fl._pf_slot_by_id.values())
    fl._pf_free = [s for s in range(fl.params.poseframe_capacity)
                   if s not in used]
    fl._refresh_feat_mirror()
