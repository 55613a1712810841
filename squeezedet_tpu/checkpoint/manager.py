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
    eval.py:221-229).  Safe against a concurrent retention pruner: if
    a listed step vanished before its isdir check (the poller was
    descheduled across a save+prune cycle), the listdir snapshot is
    stale — re-scan rather than report the directory empty.  A scan
    that finds at least one live step is authoritative enough: the
    newest finalized step is never pruned until a newer one exists, so
    a stale maximum only means the next poll will see a larger step.
    """
    if not os.path.isdir(directory):
        return None
    for _ in range(8):
        steps = []
        raced = False
        for name in os.listdir(directory):
            m = _STEP_RE.match(name)
            if m:
                if os.path.isdir(os.path.join(directory, name)):
                    steps.append(int(m.group(1)))
                else:
                    raced = True
        if steps or not raced:
            break
    return max(steps) if steps else None


def all_steps(directory: str) -> list:
    """Every finalized checkpoint step in ``directory``, ascending."""
    if not os.path.isdir(directory):
        return []
    steps = []
    for name in os.listdir(directory):
        m = _STEP_RE.match(name)
        if m and os.path.isdir(os.path.join(directory, name)):
            steps.append(int(m.group(1)))
    return sorted(steps)


class CheckpointManager:
    """Save/restore param + optimizer-state pytrees keyed by step.

    ``max_to_keep`` bounds the checkpoint directory like the reference's
    ``tf.train.Saver`` default of 5 (train.py:240): after each save,
    steps older than the newest ``max_to_keep`` are pruned (their
    ``sampler.ckpt-<step>*.npz`` input-stream snapshots too).  ``None``
    or 0 keeps everything.  Pruning renames the step directory out of
    :func:`latest_step`'s anchored pattern FIRST and rmtrees the rename,
    so a concurrently polling eval daemon can never pick up (or observe
    a half-deleted) pruned step; the newest finalized step is never
    touched.
    """

    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep or 0
        self._ckptr = ocp.StandardCheckpointer() if _HAVE_ORBAX else None

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, "model.ckpt-{}".format(step))

    def prune(self, keep_newest: int) -> list:
        """Delete all but the newest ``keep_newest`` finalized steps
        (and their sampler snapshots).  Returns the pruned steps."""
        import shutil
        # Sweep residue from a prune interrupted mid-rmtree; a stale
        # non-empty *.pruning dir would otherwise block every future
        # rename of that step and leak it (plus its sampler files).
        for name in os.listdir(self.directory):
            if ".pruning" in name:
                shutil.rmtree(os.path.join(self.directory, name),
                              ignore_errors=True)
        steps = all_steps(self.directory)
        pruned = steps[:-keep_newest] if keep_newest > 0 else steps
        for step in pruned:
            path = self._path(step)
            doomed = "{}.pruning.{}".format(path, os.getpid())
            try:
                os.rename(path, doomed)  # atomic: unmatches latest_step
            except OSError:  # pragma: no cover - concurrent pruner won
                continue
            shutil.rmtree(doomed, ignore_errors=True)
            # Exact step match only: a bare prefix test on step 1000
            # would also claim sampler.ckpt-10000.npz (a LIVE step).
            sampler_re = re.compile(
                r"^sampler\.ckpt-{}(\.p\d+)?\.npz$".format(step))
            for name in os.listdir(self.directory):
                if sampler_re.match(name):
                    try:
                        os.remove(os.path.join(self.directory, name))
                    except OSError:  # pragma: no cover
                        pass
        return pruned

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
            if self.max_to_keep and jax.process_index() == 0:
                # prune BEFORE the new save starts: every prior save is
                # finalized here, so keeping the newest max_to_keep-1
                # plus the incoming step bounds the dir at max_to_keep.
                # Always retain >= 1 finalized step so a polling daemon
                # never observes an empty dir (max_to_keep=1 therefore
                # transiently holds 2).
                self.prune(max(self.max_to_keep - 1, 1))
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
