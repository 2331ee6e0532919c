"""Training checkpoint / resume on orbax.

The reference devkit has no training checkpointing (its persistence is
msgpack object dumps, mirrored in :mod:`d3d_tpu.abstraction`); SURVEY.md §5
lists checkpoint/resume as an aux subsystem a production framework needs.
This module provides it TPU-natively: async orbax saves of the full train
state (params / batch_stats / opt_state / step), automatic restore onto
the *current* sharding layout (orbax restores each leaf to the mesh
placement the train step will use, so a checkpoint written on one dp x tp
layout resumes on another), and bounded retention.

Usage::

    ckpt = TrainCheckpointer("/ckpts/run0", keep=3)
    for step in range(start, nsteps):
        params, bs, opt_state, aux = train_step(params, bs, opt_state, b)
        ckpt.maybe_save(step, params, bs, opt_state, every=1000)
    # resume
    state = ckpt.restore()            # None if no checkpoint yet
    state = ckpt.restore(like=(params, bs, opt_state))  # sharded restore
"""

import os

import jax

__all__ = ["TrainCheckpointer"]


class TrainCheckpointer:
    """Async orbax checkpointing of (params, batch_stats, opt_state).

    :param directory: checkpoint root (created if missing)
    :param keep: number of most-recent checkpoints retained
    """

    def __init__(self, directory, keep=3):
        import orbax.checkpoint as ocp

        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, enable_async_checkpointing=True),
        )

    # -- save ---------------------------------------------------------------
    def save(self, step, params, batch_stats, opt_state, force=False):
        """Queue an async save of the train state at ``step``. Saving a
        step that already exists is a no-op returning False (orbax raises
        StepAlreadyExists even under ``force=True``)."""
        import orbax.checkpoint as ocp
        from orbax.checkpoint.checkpoint_manager import \
            StepAlreadyExistsError

        state = {"params": params, "batch_stats": batch_stats,
                 "opt_state": opt_state}
        try:
            return self._mgr.save(step, args=ocp.args.StandardSave(state),
                                  force=force)
        except StepAlreadyExistsError:
            return False

    def maybe_save(self, step, params, batch_stats, opt_state, every=1000):
        if every and step % every == 0:
            return self.save(step, params, batch_stats, opt_state)
        return False

    # -- restore ------------------------------------------------------------
    @property
    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, step=None, like=None):
        """Restore a train state.

        :param step: checkpoint step (default: latest)
        :param like: optional (params, batch_stats, opt_state) template —
            each restored leaf adopts the template leaf's sharding, so a
            resume lands directly on the current mesh layout without a
            host round-trip.
        :returns: dict with params / batch_stats / opt_state, or None when
            the directory has no checkpoint.
        """
        import orbax.checkpoint as ocp

        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if like is None:
            return self._mgr.restore(step)
        params, batch_stats, opt_state = like
        template = {"params": params, "batch_stats": batch_stats,
                    "opt_state": opt_state}
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if hasattr(x, "sharding") else x, template)
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))

    def wait(self):
        """Block until queued async saves are durable."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
