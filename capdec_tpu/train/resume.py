"""Full-state checkpoint/resume via Orbax.

The reference never saves optimizer or scheduler state — `--pretrain_weights`
"resume" restarts the LR schedule from step 0 (SURVEY.md §5). Here the
complete train state (params + optimizer moments + step) checkpoints
atomically with Orbax so training resumes exactly, alongside the
reference-format `.pt` weight snapshots.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_train_state(state: Dict[str, Any], out_dir: str,
                     step: Optional[int] = None) -> str:
    import jax
    path = os.path.abspath(os.path.join(
        out_dir, f"state_{int(step) if step is not None else 'latest'}"))
    host_state = jax.tree.map(lambda x: x, state)
    _checkpointer().save(path, host_state, force=True)
    return path


def restore_train_state(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    restored = _checkpointer().restore(os.path.abspath(path),
                                       item=template)
    return restored


def latest_state_path(out_dir: str) -> Optional[str]:
    if not os.path.isdir(out_dir):
        return None
    candidates = [d for d in os.listdir(out_dir) if d.startswith("state_")]
    if not candidates:
        return None

    def key(d):
        tail = d.split("_", 1)[1]
        return (1, 0) if tail == "latest" else (0, int(tail))

    return os.path.join(out_dir, sorted(candidates, key=key)[-1])
