"""Checkpoint / resume for progressive renders and fits.

The reference loses all accumulation state on reload (SURVEY.md §5
"Checkpoint/resume: none"); multi-host progressive renders are long-running,
so here the full render state — accumulation pytree, frame counter, renderer
key/params, and scene hashes — round-trips through a single ``.npz`` file.
Deterministic seeding (seeds derive from the frame index) makes a resumed
render bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_state(state) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    return arrays, treedef


def save(path, renderer_key: str, state, frame_number: int,
         params=None, extra: dict = None):
    """Write a progressive-render checkpoint."""
    arrays, treedef = _flatten_state(state)
    meta = {
        "renderer": renderer_key,
        "frame_number": int(frame_number),
        "treedef": str(treedef),
        "extra": extra or {},
    }
    if params is not None:
        meta["params"] = {
            f.name: (getattr(params, f.name)
                     if not hasattr(getattr(params, f.name), "tolist")
                     else np.asarray(getattr(params, f.name)).tolist())
            for f in dataclasses.fields(params)
        }
    np.savez(path, __meta__=json.dumps(meta), **arrays)


def load(path, state_example=None):
    """Read a checkpoint → (renderer_key, state, frame_number, meta).

    ``state_example``: a pytree with the same structure used to restore the
    treedef (its leaf values are ignored).  If omitted, the state is returned
    as the raw leaf list.
    """
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    leaves = [jnp.asarray(data[f"leaf_{i}"])
              for i in range(len([k for k in data.files
                                  if k.startswith("leaf_")]))]
    if state_example is not None:
        treedef = jax.tree_util.tree_structure(state_example)
        state = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        state = leaves
    return meta["renderer"], state, meta["frame_number"], meta


def save_sharded(directory, renderer_key: str, state, frame_number: int,
                 params=None, extra: dict = None, wait: bool = True):
    """Orbax checkpoint of a (possibly device-sharded) render state.

    The npz path above is the simple single-host format; this one handles
    multi-host sharded ``jax.Array`` states with async I/O — each host
    writes only its shards, and ``wait=False`` returns while the write
    completes in the background (call the returned checkpointer's
    ``wait_until_finished`` before exiting)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    meta = {
        "renderer": renderer_key,
        "frame_number": int(frame_number),
        "extra": extra or {},
    }
    if params is not None:
        meta["params"] = {
            f.name: (getattr(params, f.name)
                     if not hasattr(getattr(params, f.name), "tolist")
                     else np.asarray(getattr(params, f.name)).tolist())
            for f in dataclasses.fields(params)
        }
    ckptr = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())
    ckptr.save(
        directory,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            meta=ocp.args.JsonSave(meta),
        ),
        force=True,
    )
    if wait:
        ckptr.wait_until_finished()
    return ckptr


def load_sharded(directory, state_example=None):
    """Restore an orbax checkpoint → (renderer_key, state, frame_number,
    meta).  ``state_example`` (a pytree of arrays or ShapeDtypeStruct with
    shardings attached) restores each leaf directly onto its devices; if
    omitted, leaves load replicated on the default device."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    ckptr = ocp.Checkpointer(ocp.CompositeCheckpointHandler())
    restore_args = ocp.args.Composite(
        state=(ocp.args.StandardRestore(state_example)
               if state_example is not None else ocp.args.StandardRestore()),
        meta=ocp.args.JsonRestore(),
    )
    out = ckptr.restore(directory, args=restore_args)
    meta = out["meta"]
    return meta["renderer"], out["state"], meta["frame_number"], meta


def resume_renderer(path, height: int = None, width: int = None):
    """Rebuild a Renderer from a checkpoint (factory + params + state)."""
    from ..renderers import factory

    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    key = meta["renderer"]
    module = factory.get_module(key)
    pkwargs = meta.get("params", {})
    pfields = {f.name for f in dataclasses.fields(module.Params)}
    params = module.Params(**{k: (tuple(v) if isinstance(v, list) else v)
                              for k, v in pkwargs.items() if k in pfields})
    leaves = [jnp.asarray(data[f"leaf_{i}"])
              for i in range(len([k for k in data.files
                                  if k.startswith("leaf_")]))]
    first = leaves[0]
    h = height or first.shape[0]
    w = width or first.shape[1]
    renderer = factory.make_renderer(key, params=params, height=h, width=w)

    # restore the state pytree via a structure-matching reset
    # (dict states keep sorted key order under tree_flatten)
    probe_scene = meta.get("extra", {}).get("needs_scene", False)
    if not probe_scene:
        try:
            example = module.reset(params, h, w, None)
        except (AssertionError, TypeError):
            example = None
    else:
        example = None
    if example is not None:
        treedef = jax.tree_util.tree_structure(example)
        renderer.state = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        # MCM/DOS-style dict states: rebuild by key order
        names = meta.get("extra", {}).get("state_keys")
        if names:
            renderer.state = dict(zip(sorted(names), leaves))
        else:
            renderer.state = leaves[0] if len(leaves) == 1 else leaves
    renderer.frame_number = meta["frame_number"]
    return renderer
