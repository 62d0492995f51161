"""Durable checkpoints (orbax) + the out.npz soft-label artifact.

The reference's only durable artifacts are end-of-run: `out.npz`
(the load-bearing teacher->student handoff), optional `model.pth`
state_dict and loss curves (SURVEY.md §5 checkpoint/resume). Here the
model checkpoint is an orbax PyTree directory (`model.ckpt/`) holding
{params, batch_stats}; the out.npz contract is byte-compatible with
the reference (np.savez of a single array)."""

from __future__ import annotations

import os
from pathlib import Path

import jax
import numpy as np


def save_model(path, params, batch_stats=None) -> None:
    """Write {params, batch_stats} under `path` (directory)."""
    path = Path(path).absolute()
    tree = {"params": params, "batch_stats": batch_stats or {}}
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(tree), force=True)
        ckptr.wait_until_finished()
    except Exception:
        # flat-npz fallback keeps the artifact portable
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        arrays = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
        os.makedirs(path, exist_ok=True)
        np.savez(path / "flat.npz", **arrays)


def load_model(path):
    """Load {params, batch_stats} saved by save_model — orbax directory
    or the flat-npz fallback (keys are tree_flatten_with_path keystrs,
    e.g. "['params']['layers_0']['kernel']")."""
    path = Path(path).absolute()
    npz = path / "flat.npz"
    if npz.is_file():
        import re

        arrays = np.load(npz)
        tree: dict = {}
        seg = re.compile(r"\[(?:'((?:[^'\\]|\\.)*)'|\"((?:[^\"\\]|\\.)*)\")\]")
        for keystr, value in arrays.items():
            # keystrs are jax keystr() dict paths: ['a']['b']...; parse
            # quoted segments and fail loudly on anything else (keys
            # containing brackets/quotes would silently corrupt the
            # stripped-split parse this replaces)
            matches = list(seg.finditer(keystr))
            if not matches or "".join(m.group(0) for m in matches) != keystr:
                raise ValueError(
                    f"unparseable checkpoint key {keystr!r} in {npz}")
            keys = [m.group(1) if m.group(1) is not None else m.group(2)
                    for m in matches]
            node = tree
            for k in keys[:-1]:
                node = node.setdefault(k, {})
            node[keys[-1]] = value
        tree.setdefault("params", {})
        tree.setdefault("batch_stats", {})
        return tree

    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(path)
