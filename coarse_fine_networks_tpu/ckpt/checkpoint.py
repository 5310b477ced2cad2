"""Native pytree checkpoints.

Equivalent of the reference's ``torch.save({'model_state_dict', ...})`` every
1000 steps (``train_fine.py:245-249``), plus auto-resume-from-latest (the
reference's manual ``steps>0`` resume block, ``train_fine.py:118-120``).

Uses ``flax.serialization`` msgpack — single file, multi-host safe when only
process 0 writes.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, state: Dict[str, Any]) -> str:
    """Serialise a pytree (params / batch_stats / opt_state / step ...)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    state = jax.device_get(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(state))
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    """Load a checkpoint; with ``target``, restores into its structure."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if target is None:
        return raw
    return serialization.from_state_dict(target, raw)


_STEP_RE = re.compile(r"_(\d+)\.ckpt$")


def latest_checkpoint(directory: str, prefix: str) -> Optional[str]:
    """Find the highest-step ``<prefix>_NNNNNN.ckpt`` in ``directory``."""
    if not os.path.isdir(directory):
        return None
    best, best_step = None, -1
    for name in os.listdir(directory):
        if not name.startswith(prefix):
            continue
        m = _STEP_RE.search(name)
        if m and int(m.group(1)) > best_step:
            best, best_step = os.path.join(directory, name), int(m.group(1))
    return best
