"""Checkpointing: native pytree checkpoints + PyTorch ``.pt`` conversion."""

from .torch_convert import (
    convert_torch_state_dict,
    export_torch_state_dict,
    merge_trees,
)
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint

__all__ = [
    "convert_torch_state_dict",
    "export_torch_state_dict",
    "merge_trees",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
]
