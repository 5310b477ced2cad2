"""Optional Orbax checkpoint backend.

The default msgpack checkpoints (:mod:`.checkpoint`) are single-file and
simple; for large-scale multi-host training Orbax adds async, sharded and
atomically-committed checkpoints.  This thin adapter keeps the same pytree
payloads so the two backends are interchangeable.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def available() -> bool:
    try:
        import orbax.checkpoint  # noqa: F401

        return True
    except Exception:
        return False


def save_checkpoint(path: str, state: Dict[str, Any]) -> str:
    """Save a pytree with Orbax (StandardCheckpointer); ``path`` is a
    directory."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def load_checkpoint(path: str,
                    target: Optional[Dict[str, Any]] = None):
    """Restore a pytree saved by :func:`save_checkpoint`.

    With ``target`` (a pytree of like-shaped arrays) restore is
    structure-checked; without it, the raw stored pytree is returned.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, target)
        return ckptr.restore(path)
