"""
Checkpoint / resume for fitter, network, and sampler state.

The reference has no in-library persistence (SURVEY.md section 5): demos
pickle whole objects with dill, and its longest computations (full-catalog
fits, 100K-step SOM training) run uninterruptible.  Here every stateful
object exposes its state as a flat dict of arrays, saved either through
Orbax (directory checkpoints, async-capable, preferred on multi-host) or
NumPy `.npz` (single-file, dependency-free fallback).

Batch-granular resume: `BruteForce.fit`-style loops write into
preallocated host arrays, so a checkpoint taken between batches captures a
consistent prefix; samplers resume exactly via their stored `_chain_state`
(the reference restarts from `self.samples[-1]`, samplers.py:173-179).
"""

from __future__ import annotations

import os

import numpy as np
import jax

__all__ = ["state_dict", "load_state_dict", "save", "restore", "exists",
           "validate_plan"]

# Attributes that constitute persistent state, per class name.
_STATE_ATTRS = {
    "BruteForce": ["fit_lnprior", "fit_lnlike", "fit_lnprob", "fit_Ndim",
                   "fit_chi2", "fit_scale", "fit_scale_err", "NDATA",
                   "_fit_rows_done"],
    "NearestNeighbors": ["fit_lnprior", "fit_lnlike", "fit_lnprob",
                         "fit_Ndim", "fit_chi2", "fit_scale",
                         "fit_scale_err", "neighbors", "Nneighbors",
                         "NDATA", "k", "features", "_fit_rows_done"],
    "_Network": ["nodes", "nodes_pos", "nodes_idxs", "nodes_logwts",
                 "nodes_scales", "nodes_scales_err", "nodes_bmus",
                 "nodes_Nmatch", "nodes_Nbmu", "nodes_only", "models_lmap",
                 "models_levid", "neighbors", "Nneighbors", "fit_lnprior",
                 "fit_lnlike", "fit_lnprob", "fit_Ndim", "fit_chi2",
                 "fit_scale", "fit_scale_err", "NNODE", "NPROJ", "NDATA",
                 "_fit_rows_done"],
    "population_sampler": ["samples", "samples_lnp", "_chain_state"],
    "hierarchical_sampler": ["samples", "samples_lnp", "_chain_state"],
}
_STATE_ATTRS["SelfOrganizingMap"] = _STATE_ATTRS["_Network"] + ["NSIDE"]
_STATE_ATTRS["GrowingNeuralGas"] = _STATE_ATTRS["_Network"] + [
    "nodes_err", "edge_ages"]


def _attrs_for(obj):
    for klass in type(obj).__mro__:
        if klass.__name__ in _STATE_ATTRS:
            return _STATE_ATTRS[klass.__name__]
    raise TypeError("no checkpoint schema for {}".format(type(obj)))


def state_dict(obj):
    """Extract an object's persistent state as {name: array-or-scalar}."""
    out = {}
    for name in _attrs_for(obj):
        val = getattr(obj, name, None)
        if val is None:
            continue
        if isinstance(val, list):
            val = np.asarray(val)
        elif isinstance(val, jax.Array):
            val = np.asarray(val)
        out[name] = val
    return out


def load_state_dict(obj, state):
    """Restore state produced by `state_dict` onto `obj` (in place)."""
    list_attrs = {"samples", "samples_lnp"}
    for name, val in state.items():
        val = np.asarray(val)
        if name in list_attrs:
            setattr(obj, name, list(val))
        elif val.ndim == 0:
            item = val.item()
            setattr(obj, name, item)
        else:
            setattr(obj, name, val)
    return obj


def validate_plan(checkpoint_every, checkpoint_file):
    """Fail fast on an unusable checkpoint request.

    Called at the entry of every loop that honors `checkpoint_every`:
    without this, a missing `checkpoint_file` only surfaces at the FIRST
    save — after the batches the checkpoint was supposed to protect.
    """
    if checkpoint_every:
        if not checkpoint_file:
            raise ValueError("checkpoint_every requires checkpoint_file")
        if int(checkpoint_every) < 1:
            raise ValueError(
                "checkpoint_every must be a positive batch count")


def save(path, obj_or_state, use_orbax=None):
    """Checkpoint an object (or a raw state dict) to `path`.

    With Orbax available (and `use_orbax` not False) the checkpoint is an
    Orbax directory; otherwise a single `.npz` file.
    """
    state = (obj_or_state if isinstance(obj_or_state, dict)
             else state_dict(obj_or_state))
    state = {k: v for k, v in state.items() if v is not None}
    if use_orbax is None:
        use_orbax = _orbax() is not None
    if use_orbax:
        ocp = _orbax()
        path = os.path.abspath(path)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, state, force=True)
    else:
        np.savez(path if path.endswith(".npz") else path + ".npz", **state)
    return path


def restore(path, obj=None):
    """Load a checkpoint; if `obj` is given, restore onto it in place."""
    if os.path.isdir(path):
        ocp = _orbax()
        with ocp.PyTreeCheckpointer() as ckptr:
            state = ckptr.restore(os.path.abspath(path))
    else:
        fname = path if path.endswith(".npz") else path + ".npz"
        with np.load(fname, allow_pickle=False) as f:
            state = {k: f[k] for k in f.files}
    if obj is not None:
        return load_state_dict(obj, state)
    return state


def exists(path):
    """True if `path` holds a checkpoint written by `save` (Orbax
    directory or `.npz` file)."""
    return (os.path.isdir(path) or os.path.exists(path)
            or os.path.exists(path + ".npz"))


def _orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except Exception:
        return None
