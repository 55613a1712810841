"""Orbax-backed checkpointing.

TPU-native replacement for ``tf.train.Saver`` (train.py:240, 328-330;
eval restores params only, eval.py:205).  Keeps the reference's
filesystem contract: a checkpoint directory that the eval daemon polls
for new steps (eval.py:210-239).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np

try:  # orbax is in the image; guard anyway so pure-numpy flows still work
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False

_STEP_RE = re.compile(r"^(?:model\.ckpt-|)(\d+)$")


def latest_step(directory: str) -> Optional[int]:
    """Largest checkpoint step present in ``directory`` (None if empty).

    Mirrors tf.train.get_checkpoint_state polling (train.py:243-245,
    eval.py:221-229).
    """
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        m = _STEP_RE.match(name)
        if m and os.path.isdir(os.path.join(directory, name)):
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


class CheckpointManager:
    """Save/restore param + optimizer-state pytrees keyed by step."""

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer() if _HAVE_ORBAX else None

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, "model.ckpt-{}".format(step))

    def save(self, step: int, tree: Any, wait: bool = True) -> str:
        """Write ``model.ckpt-<step>``.

        ``wait=False`` overlaps the write with subsequent training:
        orbax finalizes asynchronously into a tmp directory and renames
        atomically, and :func:`latest_step`'s anchored pattern never
        matches tmp names, so a polling eval daemon only ever sees
        finalized steps either way.  Callers passing host arrays (the
        train loop device_gets the state first) need no further care;
        call :meth:`wait_until_finished` before process exit so the
        last step isn't lost.
        """
        path = self._path(step)
        if self._ckptr is not None:
            # serialize with any in-flight async save (orbax allows one)
            self._ckptr.wait_until_finished()
            self._ckptr.save(path, tree, force=True)
            if wait:
                self._ckptr.wait_until_finished()
        else:  # pragma: no cover
            os.makedirs(path, exist_ok=True)
            flat, treedef = jax.tree_util.tree_flatten(tree)
            np.savez(os.path.join(path, "arrays.npz"),
                     *[np.asarray(x) for x in flat])
        return path

    def wait_until_finished(self) -> None:
        """Block until any async :meth:`save` has finalized."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()

    def restore(self, step: int, like: Any) -> Any:
        path = self._path(step)
        if self._ckptr is None:
            raise RuntimeError("orbax unavailable")  # pragma: no cover
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), like)
        restored = self._ckptr.restore(path, abstract)

        # Orbax restores the shapes as SAVED; a checkpoint from a
        # different model family would otherwise flow silently into a
        # mismatched net and produce garbage detections.
        def _check(path_keys, r, t):
            if np.shape(r) != np.shape(t):
                raise ValueError(
                    "checkpoint/model shape mismatch at {}: checkpoint "
                    "has {}, model expects {} — wrong --net or "
                    "resolution for this checkpoint?".format(
                        jax.tree_util.keystr(path_keys), np.shape(r),
                        np.shape(t)))
            return r

        return jax.tree_util.tree_map_with_path(_check, restored, like)

    def restore_params(self, step: int, params_like: Any) -> Any:
        """Restore only the ``params`` subtree of a saved train state.

        Inference jobs (eval daemon, demo) restore model parameters
        without reconstructing an optimizer-state template — the moral
        equivalent of the reference's ``Saver(model.model_params)``
        (eval.py:205).  Shape validation matches :meth:`restore`.
        """
        path = self._path(step)
        if self._ckptr is None:
            raise RuntimeError("orbax unavailable")  # pragma: no cover
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype),
            params_like)
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                path, args=ocp.args.PyTreeRestore(
                    item={"params": abstract}, partial_restore=True))

        def _check(path_keys, r, t):
            if np.shape(r) != np.shape(t):
                raise ValueError(
                    "checkpoint/model shape mismatch at {}: checkpoint "
                    "has {}, model expects {} — wrong --net or "
                    "resolution for this checkpoint?".format(
                        jax.tree_util.keystr(path_keys), np.shape(r),
                        np.shape(t)))
            return r

        return jax.tree_util.tree_map_with_path(
            _check, restored["params"], params_like)

    def restore_latest(self, like: Any):
        """Returns (step, tree) or (None, None)."""
        step = latest_step(self.directory)
        if step is None:
            return None, None
        return step, self.restore(step, like)
