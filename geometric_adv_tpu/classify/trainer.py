"""PointNet classifier training/inference driver.

Replaces the reference's TF1 session training script
(reference: classifier/train_classifier.py) with one jitted train step:
Adam with the reference's staircase lr decay (base 0.001, x0.7 every
200k examples, floor 1e-5; train_classifier.py:92-100), per-point gaussian
jitter augmentation clipped at 0.05 (provider.py:66-77), batch 32.

Inference mirrors ``PointNetClassifier.classify``
(reference: classifier/pointnet_classifier.py:54-73): batched argmax labels.
"""

from __future__ import annotations

import time
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from geometric_adv_tpu.models.pointnet_cls import (
    PointNetClassifier,
    classifier_loss,
)
from geometric_adv_tpu.parallel.mesh import (
    batch_sharding,
    pad_to_multiple,
    replicated,
)
from geometric_adv_tpu.train import checkpoint as ckpt


class ClsState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    epoch: jnp.ndarray


def jitter_point_cloud(batch, sigma=0.01, clip=0.05, rng=None):
    """reference: classifier/provider.py:66-77."""
    rng = rng or np.random
    return batch + np.clip(
        sigma * rng.standard_normal(batch.shape).astype(batch.dtype),
        -clip, clip,
    )


def bn_momentum_schedule(
    step, batch_size, decay_step=200000.0, init_decay=0.5,
    decay_decay_rate=0.5, clip=0.99,
):
    """The reference's annealed BN decay, 0.5 -> 0.99.

    bn_decay(step) = min(0.99, 1 - 0.5 * 0.5^floor(step*bs/decay_step))
    (staircase exponential on the example count; reference:
    classifier/train_classifier.py:80-83,104-110). TF's ``decay`` and flax's
    ``momentum`` share the convention ra = m*ra + (1-m)*batch_stat, so the
    value feeds flax BatchNorm directly.
    """
    examples = jnp.asarray(step, jnp.float32) * batch_size
    momentum = init_decay * decay_decay_rate ** jnp.floor(
        examples / decay_step
    )
    return jnp.minimum(clip, 1.0 - momentum)


class ClassifierTrainer:
    def __init__(
        self,
        num_classes: int = 13,
        num_points: int = 2048,
        batch_size: int = 32,
        base_lr: float = 0.001,
        decay_step: int = 200000,
        decay_rate: float = 0.7,
        mesh=None,
        seed: int = 0,
        bn_momentum: float = 0.9,
    ):
        self.num_classes = num_classes
        self.num_points = num_points
        self.batch_size = batch_size
        self.mesh = mesh
        self.decay_step = decay_step
        self.model = PointNetClassifier(
            num_classes=num_classes, bn_momentum=bn_momentum
        )

        def lr_schedule(step):
            lr = base_lr * decay_rate ** (
                (step * batch_size) // decay_step
            )
            return jnp.maximum(lr, 1e-5)  # reference: CLIP THE LEARNING RATE

        self.tx = optax.adam(lr_schedule)

        variables = self.model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, num_points, 3), jnp.float32),
            train=False,
        )
        self.state = ClsState(
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=self.tx.init(variables["params"]),
            step=jnp.zeros((), jnp.int32),
            epoch=jnp.zeros((), jnp.int32),
        )
        if mesh is not None:
            self.state = jax.device_put(self.state, replicated(mesh))
        self._jit_train_step = jax.jit(self._train_step)
        self._jit_logits = jax.jit(self._logits)
        self._epoch_fns = {}

    def _device_epoch_fn(self, n_batches: int):
        """Whole epoch as one device program: shuffle + per-point jitter
        (reference: provider.py:66-77, on-device) + scanned train steps —
        one dispatch per epoch instead of one per batch."""
        if n_batches in self._epoch_fns:
            return self._epoch_fns[n_batches]

        bs = self.batch_size

        @jax.jit
        def epoch_fn(state, pcs, labels, key):
            n = pcs.shape[0]
            kperm, kjit, kdrop = jax.random.split(key, 3)
            perm = jax.random.permutation(kperm, n)[: n_batches * bs]
            xb = pcs[perm].reshape((n_batches, bs) + pcs.shape[1:])
            yb = labels[perm].reshape((n_batches, bs))
            jitter = jnp.clip(
                0.01 * jax.random.normal(kjit, xb.shape, xb.dtype),
                -0.05, 0.05,
            )
            xb = xb + jitter
            drop_keys = jax.random.split(kdrop, n_batches)

            def body(st, inp):
                x, y, dk = inp
                st, loss, acc = self._train_step(st, x, y, dk)
                return st, (loss, acc)

            state, (losses, accs) = jax.lax.scan(
                body, state, (xb, yb, drop_keys)
            )
            return state, jnp.mean(losses), jnp.mean(accs)

        self._epoch_fns[n_batches] = epoch_fn
        return epoch_fn

    def _train_step(self, state: ClsState, x, labels, dropout_rng):
        # annealed BN decay 0.5 -> 0.99 (reference:
        # classifier/train_classifier.py:104-110), traced from the step
        # counter so the whole schedule lives inside the jitted epoch scan
        mom = bn_momentum_schedule(
            state.step, self.batch_size, float(self.decay_step)
        )

        def loss_fn(params):
            (logits, transform), updates = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                bn_momentum=mom,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            loss = classifier_loss(logits, labels, transform)
            return loss, (updates["batch_stats"], logits)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return (
            state.replace(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            loss,
            acc,
        )

    def _logits(self, state: ClsState, x):
        logits, _ = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
        )
        return logits

    # --- host API ---------------------------------------------------------
    def train(
        self, point_clouds, labels, epochs=150, log_file=None, seed=0,
        eval_data=None,
    ):
        """Epoch loop with shuffle + jitter augmentation
        (reference: classifier/train_classifier.py:227-262)."""
        key = jax.random.PRNGKey(seed)
        n = len(point_clouds)
        labels = np.asarray(labels, np.int32)
        n_batches = n // self.batch_size
        epoch_fn = self._device_epoch_fn(n_batches)
        pcs_dev = jnp.asarray(point_clouds.astype(np.float32))
        lbl_dev = jnp.asarray(labels)
        stats = []
        for _ in range(epochs):
            t0 = time.time()
            key, sub = jax.random.split(key)
            self.state, loss, acc = epoch_fn(self.state, pcs_dev, lbl_dev, sub)
            losses, accs = [float(loss)], [float(acc)]
            self.state = self.state.replace(epoch=self.state.epoch + 1)
            epoch = int(self.state.epoch)
            msg = (
                f"Classifier epoch {epoch:03d}: loss "
                f"{np.mean(losses):.4f} acc {np.mean(accs):.4f} "
                f"({time.time() - t0:.1f}s)"
            )
            print(msg)
            if log_file is not None:
                log_file.write(msg + "\n")
            stats.append((epoch, float(np.mean(losses)), float(np.mean(accs))))
            if eval_data is not None and epoch % 10 == 0:
                ex, ey = eval_data
                pred = self.classify(ex)
                print(
                    f"  eval acc: {float((pred == ey).mean()):.4f}"
                )
        return stats

    def classify(self, point_clouds, batch_size=None) -> np.ndarray:
        """Predicted labels (reference: pointnet_classifier.py:54-73).

        Inference batch 250 by default (the reference wrapper's 10 costs a
        device dispatch per 10 clouds); argmax labels are per-example."""
        batch_size = batch_size or 250
        shard_of = 1 if self.mesh is None else self.mesh.devices.size
        preds = []
        pcs = np.asarray(point_clouds, np.float32)
        for s in range(0, len(pcs), batch_size):
            xb, n_orig = pad_to_multiple(pcs[s : s + batch_size], shard_of)
            if self.mesh is not None:
                xb = jax.device_put(xb, batch_sharding(self.mesh))
            logits = self._jit_logits(self.state, xb)
            preds.append(np.argmax(np.asarray(logits)[:n_orig], -1))
        return np.concatenate(preds).astype(np.int8)

    def save(self, train_dir, epoch=None):
        epoch = int(self.state.epoch) if epoch is None else epoch
        return ckpt.save_checkpoint(
            train_dir,
            epoch,
            {
                "params": jax.device_get(self.state.params),
                "batch_stats": jax.device_get(self.state.batch_stats),
                "epoch": epoch,
            },
        )

    def restore(self, train_dir, epoch=None):
        if epoch is None:
            epoch = ckpt.latest_epoch(train_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {train_dir}")
        tree = ckpt.restore_checkpoint(train_dir, epoch)
        self.state = self.state.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            epoch=jnp.asarray(tree["epoch"], jnp.int32),
        )
        return self
