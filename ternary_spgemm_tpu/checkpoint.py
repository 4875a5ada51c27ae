"""Checkpoint / resume for models and ternary containers.

Net-new vs the reference (its only persistence is benchmark JSONs,
SURVEY.md §5): save/restore of (a) training state (params + optimizer state)
and (b) exported inference bundles (ternary container + scale + bias/alpha),
via orbax-checkpoint when available with a numpy ``.npz`` fallback so the
capability never silently disappears.

Containers are pytrees whose static aux data (K, N, tile sizes) must
round-trip too; the bundle format stores the container class name + aux
alongside the leaves and reconstructs through the format registry.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np

from ternary_spgemm_tpu.formats import all_formats
from ternary_spgemm_tpu.formats.base import TernaryFormat


def _flatten_numpy(tree) -> Tuple[dict, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}, treedef


def save_pytree(path: str, tree) -> None:
    """Save an arbitrary pytree of arrays (params, opt state) to ``path``.

    Uses orbax if importable (directory checkpoint, async-safe), else a
    ``.npz`` with the treedef serialized structurally.
    """
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.abspath(path), tree, force=True)
        ckptr.wait_until_finished()
        return
    except ModuleNotFoundError:
        pass
    arrays, _ = _flatten_numpy(tree)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def restore_pytree(path: str, like):
    """Restore a pytree saved by :func:`save_pytree`; ``like`` supplies the
    tree structure (and shardings under orbax).

    The restore path is chosen by what is *on disk* (``.npz`` file vs orbax
    directory), not by orbax importability — so an npz checkpoint written in
    a fallback environment restores fine where orbax exists, and vice versa.
    """
    p = path if path.endswith(".npz") else path + ".npz"
    if not os.path.exists(p):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(path), like)
    data = np.load(p)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, restored)


def save_container(path: str, fmt: TernaryFormat, *, gamma: float = 1.0,
                   bias=None, alpha=None) -> None:
    """Save an inference bundle: ternary container + scale + bias/alpha.

    One ``.npz`` with the container's arrays keyed *by field name* plus a
    JSON header holding the format class name and static aux data — enough
    to rebuild the exact pytree (class + K/N/tile metadata) without pickling
    code. Field-name keys make the on-disk layout independent of pytree
    flatten order, so a format whose ARRAY_FIELDS tuple is not in dataclass
    declaration order round-trips correctly.
    """
    # static metadata = the registered dataclass fields not in ARRAY_FIELDS
    import dataclasses
    cls = type(fmt)
    static = {f.name: getattr(fmt, f.name) for f in dataclasses.fields(cls)
              if f.name not in cls.ARRAY_FIELDS}
    header = {"format": cls.__name__, "static": static, "gamma": float(gamma)}
    arrays = {f"field_{name}": np.asarray(getattr(fmt, name))
              for name in cls.ARRAY_FIELDS}
    if bias is not None:
        arrays["bias"] = np.asarray(bias)
    if alpha is not None:
        arrays["alpha"] = np.asarray(alpha)
    arrays["header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez(path if path.endswith(".npz") else path + ".npz", **arrays)


def load_container(path: str):
    """Load an inference bundle -> (fmt, gamma, bias, alpha)."""
    p = path if path.endswith(".npz") else path + ".npz"
    data = np.load(p)
    header = json.loads(bytes(data["header"]).decode())
    cls = all_formats()[header["format"]]
    if f"field_{cls.ARRAY_FIELDS[0]}" in data:
        kwargs = {name: data[f"field_{name}"] for name in cls.ARRAY_FIELDS}
    else:  # legacy positional layout (round-1 bundles)
        kwargs = {name: data[f"leaf_{i}"]
                  for i, name in enumerate(cls.ARRAY_FIELDS)}
    kwargs.update(header["static"])
    fmt = cls(**kwargs)
    bias = data["bias"] if "bias" in data else None
    alpha = data["alpha"] if "alpha" in data else None
    return fmt, header["gamma"], bias, alpha
