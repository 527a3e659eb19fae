"""Best-on-validation checkpointing with resume (reference train.py:136-145,
306-314 semantics).

Orbax is the heavy-weight option; for the small (<1M param) models here we
persist with flax.serialization msgpack bytes + a JSON sidecar, which is
atomic, dependency-light, and template-restored (same robustness contract:
resume-if-exists at startup, overwrite-on-improvement).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import flax.serialization as fser


def save_checkpoint(ckpt_dir, state: Dict[str, Any], metadata: Dict[str, Any]):
    """Atomically persist a pytree ``state`` + JSON ``metadata``."""
    d = Path(ckpt_dir)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / "best_model.msgpack.tmp"
    tmp.write_bytes(fser.to_bytes(state))
    tmp.replace(d / "best_model.msgpack")
    mtmp = d / "metadata.json.tmp"
    mtmp.write_text(json.dumps(metadata, indent=2))
    mtmp.replace(d / "metadata.json")


def restore_checkpoint(
    ckpt_dir, template: Dict[str, Any]
) -> Optional[Tuple[Dict[str, Any], Dict[str, Any]]]:
    """Restore (state, metadata) if a checkpoint exists, else None.

    ``template`` is a pytree with the target structure (fresh init state).
    """
    d = Path(ckpt_dir)
    f = d / "best_model.msgpack"
    if not f.exists():
        return None
    state = fser.from_bytes(template, f.read_bytes())
    meta = json.loads((d / "metadata.json").read_text())
    return state, meta
