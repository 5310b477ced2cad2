"""PyTorch ``state_dict`` → Flax pytree conversion.

Covers the reference checkpoint families (``x3d_multigrid_kinetics_fb_pretrained``,
``fine_charades_*``, ``coarse_fineFEAT_charades_*`` — load sites
``train_fine.py:104-107``, ``extract_fineFEAT.py:103-106``,
``train_coarse_fineFEAT.py:110-123``).

Tensor layout rules:
* Conv3d ``(O, I/g, D, H, W)`` → Flax kernel ``(D, H, W, I/g, O)``;
* Conv1d k=1 ``(O, I, 1)`` and Linear ``(O, I)`` → Dense kernel ``(I, O)``;
* SubBatchNorm: ``weight/bias`` → params ``scale/bias``; ``bn.running_*`` →
  batch_stats ``mean/var``; ``split_bn.running_*`` → ``split_mean/split_var``.

Loading is *merge* semantics, mirroring the reference's
``state.update(ckpt); load_state_dict(state)`` partial restore
(``train_fine.py:105-107``): keys absent from the torch dict keep their
freshly-initialised values (e.g. a new 157-class head over a Kinetics-400
backbone).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _conv3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    if w.ndim == 3:  # Conv1d kernel size 1
        w = w[:, :, 0]
    return np.transpose(w, (1, 0))


_BLOCK_RE = re.compile(r"^(layer[1-4])\.(\d+)\.(.*)$")

# Module-relative renames inside a bottleneck block.
_BLOCK_LEAF = {
    "fc1": ("se", "fc1"),
    "fc2": ("se", "fc2"),
    "downsample.0": ("downsample_conv",),
    "downsample.1": ("downsample_bn",),
}

# Top-level module renames (torch name → flax path prefix).
_TOP = {
    "conv1_s": ("stem", "conv1_s"),
    "conv1_t": ("stem", "conv1_t"),
    "bn1": ("stem", "bn1"),
    "conv5": ("head", "conv5"),
    "bn5": ("head", "bn5"),
}


def _bn_leaf(rest: str) -> Tuple[str, str] | None:
    """Map a SubBatchNorm leaf → (collection, leaf name)."""
    table = {
        "weight": ("params", "scale"),
        "bias": ("params", "bias"),
        "bn.running_mean": ("batch_stats", "mean"),
        "bn.running_var": ("batch_stats", "var"),
        "split_bn.running_mean": ("batch_stats", "split_mean"),
        "split_bn.running_var": ("batch_stats", "split_var"),
    }
    return table.get(rest)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_torch_state_dict(
    state_dict: Mapping[str, Any],
    model: str = "fine",
) -> Dict[str, Dict]:
    """Convert a reference-architecture ``state_dict`` to Flax collections.

    Args:
      state_dict: torch name → tensor/ndarray mapping (tensors are detached
        via ``.numpy()`` if needed).
      model: ``"fine"`` or ``"coarse"`` (controls fusion-module handling).

    Returns:
      ``{"params": ..., "batch_stats": ...}`` nested dicts (numpy leaves).
    """
    params: Dict = {}
    stats: Dict = {}
    sd = {}
    for k, v in state_dict.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        # own the memory: torch's .numpy() returns a VIEW sharing storage
        # with the live tensor — without the copy, a later optimizer.step()
        # on the torch model silently mutates the converted tree (JAX only
        # materialises the leaves on device at first use)
        sd[k] = np.array(v, copy=True)

    for key, val in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        path, leaf, collection = _convert_key(key, val, model)
        if path is None:
            continue
        if collection == "params":
            _set(params, path + (leaf,), val if leaf == "bias" and val.ndim == 1
                 else _convert_tensor(key, val))
        else:
            _set(stats, path + (leaf,), val)
    return {"params": params, "batch_stats": stats}


def _convert_tensor(key: str, val: np.ndarray) -> np.ndarray:
    last = key.rsplit(".", 1)[-1]
    if last == "bias":
        return val
    if val.ndim == 5:
        return _conv3d(val)
    if val.ndim in (2, 3):
        return _dense(val)
    return val  # 1-D scale/bias


def _convert_key(key: str, val: np.ndarray, model: str):
    """Return (flax path prefix, leaf name, collection) or (None, ..) to skip."""
    # --- bottleneck blocks ------------------------------------------------
    m = _BLOCK_RE.match(key)
    if m:
        stage, idx, rest = m.group(1), m.group(2), m.group(3)
        prefix: Tuple[str, ...] = (stage, f"block{idx}")
        for torch_leaf, flax_sub in _BLOCK_LEAF.items():
            if rest.startswith(torch_leaf + "."):
                rest = rest[len(torch_leaf) + 1:]
                prefix = prefix + flax_sub
                break
        else:
            head, _, tail = rest.partition(".")
            if head.startswith("bn") or head.startswith("downsample_bn"):
                bn = _bn_leaf(tail)
                if bn is None:
                    return None, None, None
                return prefix + (head,), bn[1], bn[0]
            prefix = prefix + (head,)
            rest = tail
        # here: rest is 'weight'/'bias' of a conv, or bn leaf of downsample_bn
        if prefix[-1].startswith("downsample_bn") or prefix[-1].startswith("bn"):
            bn = _bn_leaf(rest)
            if bn is None:
                return None, None, None
            return prefix, bn[1], bn[0]
        leaf = {"weight": "kernel", "bias": "bias"}.get(rest)
        if leaf is None:
            return None, None, None
        return prefix, leaf, "params"

    # --- everything else --------------------------------------------------
    parts = key.split(".")
    head = parts[0]
    rest = ".".join(parts[1:])

    if head in ("bn1", "bn5") or (head in _TOP and head.startswith("bn")):
        bn = _bn_leaf(rest)
        if bn is None:
            return None, None, None
        return _TOP[head], bn[1], bn[0]

    if head in _TOP:
        leaf = {"weight": "kernel", "bias": "bias"}.get(rest)
        return (_TOP[head], leaf, "params") if leaf else (None, None, None)

    if head in ("fc1", "fc2"):
        leaf = {"weight": "kernel", "bias": "bias"}.get(rest)
        return (head,), leaf, "params"

    if head == "pool_1":  # GridPool (coarse)
        sub = parts[1]
        tail = ".".join(parts[2:])
        if sub.startswith("bn"):
            bn = _bn_leaf(tail)
            if bn is None:
                return None, None, None
            return ("pool_1", sub), bn[1], bn[0]
        leaf = {"weight": "kernel", "bias": "bias"}.get(tail)
        return ("pool_1", sub), leaf, "params"

    if re.match(r"^rw[2-6]$", head) or re.match(r"^mix[2-5]$", head):
        sub = parts[1]
        tail = ".".join(parts[2:])
        leaf = {"weight": "kernel", "bias": "bias"}.get(tail)
        return (head, sub), leaf, "params"

    return None, None, None


def merge_trees(base: Dict, update: Dict, strict_shapes: bool = True) -> Dict:
    """Recursively merge ``update`` into ``base`` (the reference's
    ``state.update(ckpt)`` partial-restore, ``train_fine.py:105-107``).

    Leaves present in ``update`` but shape-mismatched against ``base`` raise
    (unless ``strict_shapes=False``, then they are skipped); leaves absent
    from ``update`` keep their ``base`` value.
    """

    def rec(b, u, path):
        if not isinstance(u, dict):
            if hasattr(b, "shape") and tuple(b.shape) != tuple(np.shape(u)):
                msg = f"shape mismatch at {'/'.join(path)}: {b.shape} vs {np.shape(u)}"
                if strict_shapes:
                    raise ValueError(msg)
                return b
            return np.asarray(u, dtype=np.asarray(b).dtype) if hasattr(b, "dtype") else u
        if not isinstance(b, dict):
            raise ValueError(f"tree mismatch at {'/'.join(path)}")
        out = dict(b)
        for k, v in u.items():
            if k in b:
                out[k] = rec(b[k], v, path + (k,))
            # unknown keys in the torch dict are dropped, like dict.update on
            # a state_dict that load_state_dict would reject anyway
        return out

    return rec(base, update, ())


# ---------------------------------------------------------------------------
# Reverse direction: Flax pytree → reference-layout torch state_dict
# ---------------------------------------------------------------------------

_BLOCK_LEAF_INV = {
    ("se", "fc1"): "fc1",
    ("se", "fc2"): "fc2",
    ("downsample_conv",): "downsample.0",
    ("downsample_bn",): "downsample.1",
}
_TOP_INV = {v: k for k, v in _TOP.items()}
_BN_LEAF_INV = {
    ("params", "scale"): "weight",
    ("params", "bias"): "bias",
    ("batch_stats", "mean"): "bn.running_mean",
    ("batch_stats", "var"): "bn.running_var",
    ("batch_stats", "split_mean"): "split_bn.running_mean",
    ("batch_stats", "split_var"): "split_bn.running_var",
}


def _inv_tensor(path: Tuple[str, ...], leaf: str, val: np.ndarray) -> np.ndarray:
    if leaf == "bias" or val.ndim == 1:
        return val
    if val.ndim == 5:  # conv3d kernel (D,H,W,I/g,O) → (O,I/g,D,H,W)
        return np.transpose(val, (4, 3, 0, 1, 2))
    if val.ndim == 2:
        w = np.transpose(val, (1, 0))  # dense → (O, I)
        # RewightLayer/MixingLayer heads were Conv1d (O, I, 1) in torch
        if len(path) >= 2 and (path[0].startswith("rw") or path[0].startswith("mix")):
            w = w[:, :, None]
        return w
    return val


def _flatten(tree: Dict, prefix=()):  # leaves: (path, array)
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), np.asarray(v)


def export_torch_state_dict(params: Dict, batch_stats: Dict) -> Dict[str, np.ndarray]:
    """Flax collections → a reference-layout ``state_dict`` (numpy leaves;
    wrap with ``torch.from_numpy`` for ``load_state_dict``).  Inverse of
    :func:`convert_torch_state_dict` for the covered module set."""
    out: Dict[str, np.ndarray] = {}

    def emit(collection: str, path: Tuple[str, ...], val: np.ndarray):
        # --- BN leaves -------------------------------------------------
        leaf = path[-1]
        bn_key = (collection, leaf)
        mod = path[:-1]
        is_bn = mod and (mod[-1].startswith("bn")
                         or mod[-1] == "downsample_bn")
        if is_bn and bn_key in _BN_LEAF_INV:
            torch_mod = _module_name(mod)
            out[f"{torch_mod}.{_BN_LEAF_INV[bn_key]}"] = val
            return
        torch_leaf = {"kernel": "weight", "bias": "bias"}.get(leaf, leaf)
        out[f"{_module_name(mod)}.{torch_leaf}"] = _inv_tensor(mod, leaf, val)

    def _module_name(mod: Tuple[str, ...]) -> str:
        # stem/head wrappers
        if mod and mod[0] in ("stem", "head"):
            mod = mod[1:]
        # layerN/blockM/... → layerN.M....
        parts = []
        i = 0
        while i < len(mod):
            m = mod[i]
            if m.startswith("block") and m[5:].isdigit():
                parts.append(m[5:])
                # block sub-leafs: se/fc1 etc.
                rest = tuple(mod[i + 1:])
                for flax_sub, torch_sub in _BLOCK_LEAF_INV.items():
                    if rest[:len(flax_sub)] == flax_sub:
                        parts.append(torch_sub)
                        rest = rest[len(flax_sub):]
                        break
                parts.extend(rest)
                return ".".join(parts)
            parts.append(m)
            i += 1
        return ".".join(parts)

    for path, val in _flatten(params):
        emit("params", path, val)
    for path, val in _flatten(batch_stats):
        emit("batch_stats", path, val)
    return out
