"""Checkpoint IO with reference-compatible naming and format.

Save/load uses the reference's torch `state_dict` key layout
(`gpt.*` + `clip_project.*`) so checkpoints interoperate with the
published CapDec zoo and tooling:
  * `{prefix}-{epoch:03d}.pt` per epoch, `{prefix}_latest.pt` mid-epoch
    (reference train.py:359-371)
  * real torch `.pt` files when torch is importable (it is in this image),
    otherwise a pickle of numpy arrays with the same keys.

Loading a reference checkpoint is `load_caption_checkpoint(path, cfg)` —
key mapping and transposes live in the model converters, so every save/load
round-trips through the tested conversion path.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import numpy as np

from ..models import caption_model


def _try_torch():
    try:
        import torch
        return torch
    except Exception:
        return None


def save_state_dict(sd: Dict[str, np.ndarray], path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch = _try_torch()
    if torch is not None:
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, path)
    else:
        with open(path, "wb") as f:
            pickle.dump(sd, f)


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    torch = _try_torch()
    if torch is not None:
        try:
            sd = torch.load(path, map_location="cpu", weights_only=True)
            return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
                    for k, v in sd.items()}
        except Exception:
            pass
    with open(path, "rb") as f:
        return pickle.load(f)


def save_caption_checkpoint(params: Any, cfg: caption_model.CaptionModelConfig,
                            path: str) -> None:
    host_params = jax_to_host(params)
    sd = caption_model.params_to_torch_state_dict(host_params, cfg)
    save_state_dict(sd, path)


def load_caption_checkpoint(path: str, cfg: caption_model.CaptionModelConfig,
                            dtype=None) -> Any:
    import jax.numpy as jnp
    sd = load_state_dict(path)
    return caption_model.params_from_torch_state_dict(
        sd, cfg, dtype=dtype or jnp.float32)


def jax_to_host(tree: Any) -> Any:
    import jax
    return jax.tree.map(lambda x: np.asarray(x), tree)


def epoch_checkpoint_path(out_dir: str, prefix: str, epoch: int) -> str:
    return os.path.join(out_dir, f"{prefix}-{epoch:03d}.pt")


def latest_checkpoint_path(out_dir: str, prefix: str) -> str:
    return os.path.join(out_dir, f"{prefix}_latest.pt")
