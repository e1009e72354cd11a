"""Checkpoint save/load for Flax params (msgpack via
flax.serialization) — the rebuild's counterpart of the reference's
torch.load state-dict handling (SURVEY.md §5.4). Converted torch
checkpoints can be cached in this format to skip reconversion."""
from __future__ import annotations

import os
import os.path as osp
from typing import Any

from flax import serialization


def save_params(path: str, tree: Any) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    with open(path, 'wb') as f:
        f.write(serialization.to_bytes(tree))


def load_params(path: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (e.g. the output of
    ``model.init``)."""
    with open(path, 'rb') as f:
        return serialization.from_bytes(template, f.read())
