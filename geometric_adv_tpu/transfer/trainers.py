"""Training/inference drivers for the transfer autoencoders.

Replaces the reference's two vendored PyTorch trainers — the AtlasNet
mixin-stack Trainer (reference: transfer/atlasnet/training/trainer.py:25,
atlasnet_ae.py:27-88) and the FoldingNet script
(reference: transfer/foldingnet/train_foldingnet.py) — with the same jitted
chamfer-loss Adam loop as the victim AE. Both consume the shared .npy
train/val artifacts ("--custom_data" path, reference: runner_atlasnet.sh)
and expose the ``reconstruct/get_reconstructions/get_loss_per_pc`` interface
run_transfer expects.

All reconstruct batch conventions follow the reference wrappers: AtlasNet
reconstructs 2500 points (atlasnet_ae.py:67-88), FoldingNet 2025
(foldingnet_ae.py:39-66), PointNet 2048 (the victim AETrainer itself).
"""

from __future__ import annotations

import time
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from geometric_adv_tpu.models.atlasnet import AtlasNet, random_template_points
from geometric_adv_tpu.models.foldingnet import FoldingNet, graph_features
from geometric_adv_tpu.ops import chamfer_loss_per_pc
from geometric_adv_tpu.train import checkpoint as ckpt


class TState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray


class _TransferTrainerBase:
    """Shared jitted chamfer train step + batched inference + checkpoints."""

    def __init__(self, model, init_args, learning_rate, seed=0):
        self.model = model
        self.tx = optax.adam(learning_rate)
        variables = model.init(jax.random.PRNGKey(seed), *init_args, train=False)
        self.state = TState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(variables["params"]),
            epoch=jnp.zeros((), jnp.int32),
        )
        self._jit_train_step = jax.jit(self._train_step)
        self._jit_forward = jax.jit(self._forward)

    # subclasses define _apply(params_dict, x, train, rng) -> recon
    def _train_step(self, state, x, rng):
        def loss_fn(params):
            recon, updates = self._apply_train(
                {"params": params, "batch_stats": state.batch_stats}, x, rng
            )
            loss = jnp.mean(chamfer_loss_per_pc(recon, x))
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        return (
            state.replace(
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
            ),
            loss,
        )

    def _forward(self, state, x):
        return self._apply_eval(
            {"params": state.params, "batch_stats": state.batch_stats}, x
        )

    def _device_epoch_fn(self, n_batches: int, batch_size: int):
        """Whole epoch as one device program (shuffle + scanned steps) —
        one dispatch per epoch instead of one per batch."""

        @jax.jit
        def epoch_fn(state, pcs, key):
            n = pcs.shape[0]
            kperm, kstep = jax.random.split(key)
            perm = jax.random.permutation(kperm, n)[: n_batches * batch_size]
            xb = pcs[perm].reshape((n_batches, batch_size) + pcs.shape[1:])
            step_keys = jax.random.split(kstep, n_batches)

            def body(st, inp):
                x, sk = inp
                st, loss = self._train_step(st, x, sk)
                return st, loss

            state, losses = jax.lax.scan(body, state, (xb, step_keys))
            return state, jnp.mean(losses)

        return epoch_fn

    def train(
        self, point_clouds, epochs, batch_size, log_file=None, seed=0,
        tag="transfer", held_out=None, val_step=1,
    ):
        """``held_out`` enables the reference's per-epoch validation eval
        (FoldingNet logs a val + middle-fold val loss every 100 train
        batches, reference: transfer/foldingnet/train_foldingnet.py:129-171;
        the AtlasNet trainer runs a full test pass per epoch,
        reference: transfer/atlasnet/training/trainer.py:83-110)."""
        key = jax.random.PRNGKey(seed)
        n = len(point_clouds)
        n_batches = n // batch_size
        epoch_fn = self._device_epoch_fn(n_batches, batch_size)
        pcs_dev = jnp.asarray(np.asarray(point_clouds, np.float32))
        for _ in range(epochs):
            t0 = time.time()
            key, sub = jax.random.split(key)
            self.state, loss = epoch_fn(self.state, pcs_dev, sub)
            self.state = self.state.replace(epoch=self.state.epoch + 1)
            epoch = int(self.state.epoch)
            msg = (
                f"{tag} epoch {epoch:03d}: loss {float(loss):.6f} "
                f"({time.time() - t0:.1f}s)"
            )
            if held_out is not None and epoch % val_step == 0:
                ev = self.evaluate(held_out)
                msg += f" val loss: {ev['loss']:.6f}"
                if "mid_loss" in ev:
                    msg += f" middle val loss: {ev['mid_loss']:.6f}"
            print(msg)
            if log_file is not None:
                log_file.write(msg + "\n")
        return self

    def evaluate(self, pclouds, batch_size=100):
        """Mean clean-reconstruction loss over a point-cloud set
        (reference: transfer/foldingnet/tst_foldingnet.py:79-98 —
        example-weighted mean of chamfer(input, recon)). Subclasses may add
        further keys (FoldingNet: the middle-fold loss)."""
        pcs = np.asarray(pclouds, np.float32)
        total, n = 0.0, len(pcs)
        for s in range(0, n, batch_size):
            xb = pcs[s : s + batch_size]
            recon = self._jit_forward(self.state, xb)
            total += float(
                np.sum(np.asarray(chamfer_loss_per_pc(recon, xb)))
            )
        return {"loss": total / n}

    def get_reconstructions(self, pclouds, batch_size=100):
        # inference batch 100 vs the reference wrappers' 10/4
        # (atlasnet_ae.py:67, foldingnet_ae.py:39): each chunk is one
        # device dispatch; per-example results are independent
        outs = []
        pcs = np.asarray(pclouds, np.float32)
        for s in range(0, len(pcs), batch_size):
            outs.append(np.asarray(self._jit_forward(self.state, pcs[s : s + batch_size])))
        return np.concatenate(outs)

    def reconstruct(self, pclouds, compute_loss=True):
        recon = self.get_reconstructions(pclouds, batch_size=len(pclouds))
        loss = (
            float(np.mean(np.asarray(chamfer_loss_per_pc(recon, np.asarray(pclouds, np.float32)))))
            if compute_loss
            else None
        )
        return recon, loss

    def get_loss_per_pc(self, feed_data, orig_data=None, batch_size=10):
        orig = feed_data if orig_data is None else orig_data
        out = []
        for s in range(0, len(feed_data), batch_size):
            recon = self._jit_forward(
                self.state, np.asarray(feed_data[s : s + batch_size], np.float32)
            )
            out.append(
                np.asarray(
                    chamfer_loss_per_pc(
                        recon, np.asarray(orig[s : s + batch_size], np.float32)
                    )
                )
            )
        return np.concatenate(out)

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


class AtlasNetTrainer(_TransferTrainerBase):
    """reference: transfer/atlasnet/atlasnet_ae.py + training/trainer*.py."""

    def __init__(
        self,
        number_points: int = 2500,
        nb_primitives: int = 1,
        template_type: str = "SPHERE",
        learning_rate: float = 0.001,
        n_points_input: int = 2048,
        seed: int = 0,
        bn_momentum: float = 0.9,
    ):
        model = AtlasNet(
            number_points=number_points,
            nb_primitives=nb_primitives,
            template_type=template_type,
            bn_momentum=bn_momentum,
        )
        self._regular_template = jnp.asarray(
            np.stack([model.regular_template()] * nb_primitives)
        )
        init_args = (
            jnp.zeros((1, n_points_input, 3), jnp.float32),
            self._regular_template,
        )
        super().__init__(model, init_args, learning_rate, seed)

    def _apply_train(self, variables, x, rng):
        # train-time: random template sampling (reference: atlasnet.py:55-59)
        tpl = random_template_points(
            rng,
            self.model.nb_primitives,
            self.model.pts_per_primitive,
            self.model.template_dim,
        )
        (recon, _), updates = self.model.apply(
            variables, x, tpl, train=True, mutable=["batch_stats"]
        )
        return recon, updates

    def _apply_eval(self, variables, x):
        recon, _ = self.model.apply(
            variables, x, self._regular_template, train=False
        )
        return recon


class FoldingNetTrainer(_TransferTrainerBase):
    """reference: transfer/foldingnet/train_foldingnet.py + foldingnet_ae.py."""

    def __init__(
        self,
        learning_rate: float = 0.0001,
        n_points_input: int = 2048,
        seed: int = 0,
        bn_momentum: float = 0.9,
    ):
        model = FoldingNet(bn_momentum=bn_momentum)
        x0 = jnp.zeros((1, n_points_input, 3), jnp.float32)
        nbr0, cov0 = graph_features(x0)
        init_args = (x0, cov0, nbr0)
        super().__init__(model, init_args, learning_rate, seed)

    def _apply_train(self, variables, x, rng):
        del rng
        nbr, cov = graph_features(x)
        (recon, _, _), updates = self.model.apply(
            variables, x, cov, nbr, train=True, mutable=["batch_stats"]
        )
        return recon, updates

    def _apply_eval(self, variables, x):
        nbr, cov = graph_features(x)
        recon, _, _ = self.model.apply(variables, x, cov, nbr, train=False)
        return recon

    def _apply_eval_full(self, variables, x):
        nbr, cov = graph_features(x)
        recon, mid, _ = self.model.apply(variables, x, cov, nbr, train=False)
        return recon, mid

    def evaluate(self, pclouds, batch_size=100):
        """Adds the middle-fold (first folding stage) loss the reference
        reports alongside the final loss
        (reference: transfer/foldingnet/tst_foldingnet.py:87-98)."""
        if not hasattr(self, "_jit_forward_full"):
            self._jit_forward_full = jax.jit(
                lambda state, x: self._apply_eval_full(
                    {"params": state.params,
                     "batch_stats": state.batch_stats}, x
                )
            )
        pcs = np.asarray(pclouds, np.float32)
        total, total_mid, n = 0.0, 0.0, len(pcs)
        for s in range(0, n, batch_size):
            xb = pcs[s : s + batch_size]
            recon, mid = self._jit_forward_full(self.state, xb)
            total += float(np.sum(np.asarray(chamfer_loss_per_pc(recon, xb))))
            total_mid += float(
                np.sum(np.asarray(chamfer_loss_per_pc(mid, xb)))
            )
        return {"loss": total / n, "mid_loss": total_mid / n}


def get_transfer_ae(ae_type: str, **kwargs):
    """Factory mirroring run_transfer's ae_type switch
    (reference: transfer/run_transfer.py:97-104)."""
    if ae_type == "atlasnet":
        return AtlasNetTrainer(**kwargs)
    elif ae_type == "foldingnet":
        return FoldingNetTrainer(**kwargs)
    raise ValueError(f"unknown transfer AE type: {ae_type!r}")


ARCH_FILE = "arch.json"


def save_transfer_arch(train_dir: str, ae_type: str, **arch) -> None:
    """Persist the architecture kwargs the checkpoint was trained with, so
    inference CLIs can rebuild the matching module without the caller
    repeating the train-time flags (the reference reloads its pickled opt
    for the same purpose, transfer/atlasnet/atlasnet_ae.py:40-47)."""
    import json
    import os.path as osp

    with open(osp.join(train_dir, ARCH_FILE), "w") as f:
        json.dump({"ae_type": ae_type, **arch}, f, indent=1)


def load_transfer_arch(train_dir: str) -> dict | None:
    """Arch kwargs saved by ``save_transfer_arch``, or None (pre-arch.json
    checkpoints: callers fall back to their flag defaults)."""
    import json
    import os.path as osp

    path = osp.join(train_dir, ARCH_FILE)
    if not osp.exists(path):
        return None
    with open(path) as f:
        return json.load(f)
