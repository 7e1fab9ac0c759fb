"""Orbax checkpointing with save-every-N / keep-K / auto-resume.

Replaces the reference's ``tf.train.Saver`` triplets and its
filename-suffix-parsed global step (reference main.py:427-434,473-487)
with step-indexed Orbax directories.  Unlike the reference — which
round-trips weights train-graph -> disk -> eval-graph every eval
(main.py:480-487) — evaluation here reuses the in-memory state; the
checkpoint exists for resume/deployment only.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Thin wrapper over ocp.CheckpointManager for a dict-pytree state."""

    def __init__(self, directory: str, max_to_keep: int = 1_000_000,
                 name: str = "nhans"):
        path = os.path.abspath(os.path.join(directory, name))
        os.makedirs(path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            path,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )
        self.path = path

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None,
                template: Any = None) -> Tuple[int, Any]:
        """Restore `step` (or latest).  `template` is an abstract pytree
        (e.g. from jax.eval_shape) to restore into; None = raw restore."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.path}")
        if template is not None:
            state = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template))
        else:
            state = self._mgr.restore(step)
        return step, state

    def close(self) -> None:
        self._mgr.close()


def save_variables(path: str, variables: Any) -> None:
    """One-shot save of inference variables (params + batch_stats)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), variables, force=True)
    ckptr.wait_until_finished()
    ckptr.close()


def _resolve(path: str) -> str:
    """Resolve a user-supplied checkpoint path to the actual pytree dir.

    Accepts a directory written by ``save_variables``, a Checkpointer
    step directory, or a CheckpointManager ROOT (ckdir or
    ckdir/<model_name>) — descending to the LATEST numeric step so CLIs
    can just point at the training --checkpoint_dir.
    """
    path = os.path.abspath(path)
    for _ in range(3):
        if (os.path.isdir(os.path.join(path, "default"))
                or os.path.exists(os.path.join(path, "_CHECKPOINT_METADATA"))
                or os.path.exists(os.path.join(path, "manifest.ocdbt"))):
            break
        subs = [d for d in os.listdir(path)
                if os.path.isdir(os.path.join(path, d))]
        steps = [d for d in subs if d.isdigit()]
        if steps:
            path = os.path.join(path, max(steps, key=int))
        elif len(subs) == 1:
            path = os.path.join(path, subs[0])
        else:
            break
    # CheckpointManager step dirs nest the pytree under 'default'
    if os.path.isdir(os.path.join(path, "default")):
        path = os.path.join(path, "default")
    return path


def checkpoint_keys(path: str) -> frozenset:
    """Top-level pytree keys of an on-disk checkpoint, WITHOUT restoring
    payloads (reads the Orbax tree metadata only).

    Lets callers branch explicitly on checkpoint KIND — a full train
    state carries 'opt_state'/'step'; an inference-vars checkpoint only
    'params'/'batch_stats' — instead of exception-chained dispatch.
    """
    ckptr = ocp.StandardCheckpointer()
    try:
        tree = ckptr.metadata(_resolve(path)).item_metadata.tree
    finally:
        ckptr.close()
    if not isinstance(tree, dict):
        # Returning frozenset() here would silently misroute a full
        # train-state resume into the variables-graft branch (dropping
        # the optimizer state and step counter) — fail loudly instead.
        raise ValueError(
            f"checkpoint metadata at {path} is not a dict-like pytree "
            f"(got {type(tree).__name__}); cannot classify checkpoint "
            "kind for --restore_path dispatch")
    return frozenset(tree)


def _validate_leaves(template: Any, restored: Any, path: str) -> None:
    """Raise ValueError if restored leaf shapes/dtypes disagree with the
    abstract template (guards the raw-restore fallback, which otherwise
    grafts wrong-shaped params that only fail later as an opaque XLA
    shape error)."""
    import numpy as np

    errs = []

    def _check(kp, t, r):
        name = jax.tree_util.keystr(kp)
        tshape = tuple(getattr(t, "shape", np.shape(t)))
        rshape = tuple(np.shape(r))
        if tshape != rshape:
            errs.append(f"{name}: shape {rshape} != expected {tshape}")
            return r
        tdt = getattr(t, "dtype", None)
        rdt = getattr(r, "dtype", None)
        if tdt is not None and rdt is not None and \
                np.dtype(tdt) != np.dtype(rdt):
            errs.append(f"{name}: dtype {rdt} != expected {tdt}")
        return r

    try:
        jax.tree_util.tree_map_with_path(_check, template, restored)
    except ValueError as struct_err:
        raise ValueError(
            f"checkpoint at {path} has a different tree structure than "
            f"the model: {struct_err}") from struct_err
    if errs:
        raise ValueError(
            f"checkpoint at {path} does not match the model "
            f"({len(errs)} mismatched leaves): " + "; ".join(errs[:8]))


def load_variables(path: str, template: Any = None) -> Any:
    """One-shot restore of inference variables.

    Accepts either a directory written by ``save_variables`` or a
    Checkpointer step directory (see ``_resolve``).
    """
    path = _resolve(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        if template is not None:
            try:
                out = ckptr.restore(path, target=template)
            except ValueError as restore_err:
                # a full TRAIN-state checkpoint (params/batch_stats/
                # opt_state/...): raw-restore and keep the template's
                # sub-trees (inference needs params + batch_stats only)
                raw = ckptr.restore(path)
                if not set(template) <= set(raw):
                    raise ValueError(
                        f"checkpoint at {path} is missing keys "
                        f"{sorted(set(template) - set(raw))}; original "
                        f"restore error: {restore_err}") from restore_err
                out = {k: raw[k] for k in template}
                _validate_leaves(template, out, path)
        else:
            out = ckptr.restore(path)
    finally:
        ckptr.close()
    return out
