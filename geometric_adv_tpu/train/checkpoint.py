"""Checkpoint save/restore (replaces tf.train.Saver).

The reference saves all graph variables as ``models.ckpt-<epoch>`` every
``saver_step`` epochs (reference: src/neural_net.py:10,33-42,
src/autoencoder.py:213-216). Here a checkpoint is an orbax PyTree directory
``<train_dir>/checkpoints/<epoch>`` holding params, batch_stats, opt_state
and the epoch counter. Partial restore (the adversary restoring only the
victim AE's weights, reference: src/adversary_autoencoder.py:42-51) is the
trivial case: AE variables live in their own checkpoint; the attack state
(pert) is never entangled with them.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp

CHECKPOINT_SUBDIR = "checkpoints"


def checkpoint_path(train_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(train_dir), CHECKPOINT_SUBDIR, str(epoch))


def save_checkpoint(train_dir: str, epoch: int, tree) -> str:
    path = checkpoint_path(train_dir, epoch)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    return path


def restore_checkpoint(train_dir: str, epoch: int, target=None):
    path = checkpoint_path(train_dir, epoch)
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(path, item=target)
        try:
            return ckptr.restore(path)
        except ValueError:
            # checkpoints written by a multi-host run carry jax.Array
            # sharding metadata for the pod topology they were saved on;
            # restore them as plain numpy (values are fully replicated)
            import jax
            import numpy as np

            meta = ckptr.metadata(path).item_metadata
            restore_args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta
            )
            return ckptr.restore(path, restore_args=restore_args)


def latest_epoch(train_dir: str) -> int | None:
    root = os.path.join(os.path.abspath(train_dir), CHECKPOINT_SUBDIR)
    if not os.path.isdir(root):
        return None
    epochs = [int(d) for d in os.listdir(root) if d.isdigit()]
    return max(epochs) if epochs else None
