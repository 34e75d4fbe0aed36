"""AE training and batched inference (replaces the reference's
``AutoEncoder``/``NeuralNet`` TF1 session machinery,
reference: src/autoencoder.py:85-331, src/neural_net.py:13-43).

TPU design: one jitted train step (forward, chamfer/EMD loss, backward, Adam
update, BN moving-stat update) — the per-step Python<->device round trip of
``partial_fit`` (reference: src/autoencoder.py:105-125) becomes a single
device-side program. Data parallelism is input-sharding over a 1-D mesh:
params are replicated, the batch axis is sharded, and XLA inserts the ICI
all-reduce for gradients.
"""

from __future__ import annotations

import time
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from geometric_adv_tpu.data.augment import apply_augmentations, device_augment
from geometric_adv_tpu.models.pointnet_ae import PointNetAE
from geometric_adv_tpu.ops import chamfer_loss_per_pc, emd_loss_per_pc
from geometric_adv_tpu.parallel.distributed import (
    gather_global,
    make_global_replicated,
    shard_host_batch,
)
from geometric_adv_tpu.parallel.mesh import (
    batch_sharding,
    pad_to_multiple,
    replicated,
)
from geometric_adv_tpu.train import checkpoint as ckpt
from geometric_adv_tpu.train.config import Configuration


class AEState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray  # scalar int32, mirrors the reference's epoch counter


def reconstruction_loss_per_pc(recon, gt, loss_type: str):
    if loss_type == "chamfer":
        return chamfer_loss_per_pc(recon, gt)
    elif loss_type == "emd":
        return emd_loss_per_pc(recon, gt)
    raise ValueError(f"unknown loss {loss_type!r}")


class AETrainer:
    """Builds the model + optimizer and owns the jitted step functions."""

    def __init__(
        self,
        conf: Configuration,
        mesh=None,
        seed: int = 42,
        params=None,
        batch_stats=None,
    ):
        self.conf = conf
        self.mesh = mesh
        self.model = PointNetAE(
            n_points=conf.n_points,
            bneck_size=conf.bneck_size,
            encoder_filters=conf.encoder_filters,
            decoder_sizes=conf.decoder_sizes,
            bn_momentum=conf.b_norm_decay,
            dtype=getattr(jnp, conf.ae_dtype or "float32"),
        )

        if conf.exponential_decay and conf.decay_steps:
            # reference: src/pointnet_ae.py:93-95 — staircase halving keyed
            # on the EPOCH counter with a 1e-5 floor. optax schedules see the
            # per-batch update count, so convert via steps_per_epoch.
            spe = conf.steps_per_epoch or 1
            self.lr_schedule = lambda step: jnp.maximum(
                conf.learning_rate
                * 0.5 ** ((step // spe) // conf.decay_steps),
                1e-5,
            )
        else:
            self.lr_schedule = conf.learning_rate
        self.tx = optax.adam(self.lr_schedule)

        if params is None:
            variables = self.model.init(
                jax.random.PRNGKey(seed),
                jnp.zeros((1, conf.n_points, 3), jnp.float32),
                train=False,
            )
            params = variables["params"]
            batch_stats = variables["batch_stats"]
        self.state = AEState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            epoch=jnp.zeros((), jnp.int32),
        )
        if mesh is not None:
            self.state = self._replicate_state(self.state)

        self._jit_train_step = jax.jit(self._train_step)
        self._jit_forward = jax.jit(self._forward)
        self._jit_decode = jax.jit(
            lambda state, zz: self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                zz,
                train=False,
                method=PointNetAE.decode,
            )
        )

    def _replicate_state(self, state):
        """Replicate the state pytree over the mesh, multi-host aware
        (device_put cannot target non-addressable devices; every process
        holds the identical state because init/restore are deterministic)."""
        if jax.process_count() == 1:
            return jax.device_put(state, replicated(self.mesh))
        return jax.tree.map(
            lambda a: make_global_replicated(jax.device_get(a), self.mesh),
            state,
        )

    # --- device-side programs -------------------------------------------
    def _train_step(self, state: AEState, x, gt):
        def loss_fn(params):
            (recon, _, _), updates = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            loss = jnp.mean(reconstruction_loss_per_pc(recon, gt, self.conf.loss))
            return loss, (updates["batch_stats"], recon)

        (loss, (new_stats, recon)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt_state
        )
        return new_state, loss, recon

    def _forward(self, state: AEState, x, gt):
        recon, z, pre_symmetry = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
        )
        loss_per_pc = reconstruction_loss_per_pc(recon, gt, self.conf.loss)
        return recon, z, pre_symmetry, loss_per_pc

    # --- host-side API (mirrors reference: src/autoencoder.py) -----------
    def partial_fit(self, x, gt=None):
        gt = x if gt is None else gt
        self.state, loss, recon = self._jit_train_step(self.state, x, gt)
        return np.asarray(recon), float(loss)

    def _batched_forward(self, pclouds, gt=None, batch_size=250,
                         outputs=("recon", "z", "pre", "loss")):
        """Chunked inference over an arbitrary number of clouds.

        Inference batch 250 (not the reference's training batch 50): each
        chunk is one device dispatch, so the defense stages run ~5x fewer
        relay round trips (measured: critical defense 30+ min -> 7 min at
        reference scale). Results across batch sizes are bit-identical on
        CPU / at --matmul_precision float32; at the TPU default bf16 matmul
        precision they sit within the documented cross-program drift
        (DESIGN §6; measured 6e-5 max on defense metrics). Memory:
        forward-only at [250, 2048] is ~0.5 GB of activations.

        Only the requested ``outputs`` are materialised to host — the rest
        stay device-resident and are dropped (the pre-symmetry map is
        bneck/3 times larger than the clouds; shipping it on every
        get_reconstructions call dominated remote-TPU runs)."""
        gt = pclouds if gt is None else gt
        names = ("recon", "z", "pre", "loss")
        outs = {k: [] for k in outputs}
        n = len(pclouds)
        shard_of = 1 if self.mesh is None else self.mesh.devices.size
        for s in range(0, n, batch_size):
            xb = np.asarray(pclouds[s : s + batch_size], np.float32)
            gb = np.asarray(gt[s : s + batch_size], np.float32)
            xb, n_orig = pad_to_multiple(xb, shard_of)
            gb, _ = pad_to_multiple(gb, shard_of)
            if self.mesh is not None:
                xb = shard_host_batch(xb, self.mesh)
                gb = shard_host_batch(gb, self.mesh)
            results = dict(zip(names, self._jit_forward(self.state, xb, gb)))
            picked = gather_global({k: results[k] for k in outputs})
            for k in outputs:
                outs[k].append(picked[k][:n_orig])
        return {k: np.concatenate(v) for k, v in outs.items()}

    def reconstruct(self, x, gt=None, compute_loss=True):
        out = self._batched_forward(
            x, gt, batch_size=len(x), outputs=("recon", "loss")
        )
        loss = float(out["loss"].mean()) if compute_loss else None
        return out["recon"], loss

    def get_reconstructions(self, pclouds, batch_size=250):
        return self._batched_forward(
            pclouds, batch_size=batch_size, outputs=("recon",)
        )["recon"]

    def get_latent_vectors(self, pclouds, batch_size=250):
        return self._batched_forward(
            pclouds, batch_size=batch_size, outputs=("z",)
        )["z"]

    def get_pre_symmetry_data(self, pclouds, batch_size=250):
        return self._batched_forward(
            pclouds, batch_size=batch_size, outputs=("pre",)
        )["pre"]

    def get_pre_symmetry_argmax(self, pclouds, batch_size=250):
        """Per-channel (argmax, max) of the pre-symmetry features, reduced
        on device — n_points times less host transfer than shipping the full
        [N, n, bneck] map (which dominated the critical-points defense
        through a remote TPU relay)."""
        if not hasattr(self, "_jit_pre_argmax"):
            @jax.jit
            def pre_argmax(state, x):
                _, _, pre = self.model.apply(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    x, train=False,
                )
                return (
                    jnp.argmax(pre, axis=-2).astype(jnp.int32),
                    jnp.max(pre, axis=-2),
                )
            self._jit_pre_argmax = pre_argmax
        idxs, vals = [], []
        pcs = np.asarray(pclouds, np.float32)
        for s in range(0, len(pcs), batch_size):
            i, v = self._jit_pre_argmax(self.state, pcs[s : s + batch_size])
            idxs.append(np.asarray(i))
            vals.append(np.asarray(v))
        return np.concatenate(idxs), np.concatenate(vals)

    def get_loss_per_pc(self, feed_data, orig_data=None, batch_size=250):
        return self._batched_forward(
            feed_data, orig_data, batch_size=batch_size, outputs=("loss",)
        )["loss"]

    def transform(self, x):
        return self.get_latent_vectors(x, batch_size=len(x))

    def decode(self, z):
        z = np.atleast_2d(np.asarray(z, np.float32))
        return np.asarray(self._jit_decode(self.state, z))

    def evaluate(self, in_data, conf=None, ret_pre_augmentation=False):
        """Full-set reconstruction + mean loss over a PointCloudDataSet
        (reference: src/autoencoder.py:229-261)."""
        conf = conf or self.conf
        pre_aug = None
        if self.conf.is_denoising:
            original, ids, feed = in_data.full_epoch_data(shuffle=False)
            if feed is None:
                feed = original
            if ret_pre_augmentation:
                pre_aug = feed.copy()
            feed = apply_augmentations(feed, conf)
        else:
            original, ids, _ = in_data.full_epoch_data(shuffle=False)
            feed = apply_augmentations(original, conf)
        # gt for the loss: the clean original only when denoising; otherwise
        # the (possibly augmented) feed reconstructs against itself
        # (reference: src/autoencoder.py:247-251 — reconstruct(feed_data)
        # with gt defaulting to the input).
        gt = original if self.conf.is_denoising else feed
        out = self._batched_forward(
            feed.astype(np.float32), gt.astype(np.float32),
            batch_size=conf.batch_size, outputs=("recon", "loss"),
        )
        data_loss = float(out["loss"].mean())
        print("evaluation loss=", "{:.9f}".format(data_loss))
        if pre_aug is not None:
            return out["recon"], data_loss, feed, ids, original, pre_aug
        return out["recon"], data_loss, feed, ids, original

    def embedding_at_layer(self, pclouds, layer_path=None, batch_size=50):
        """Activations at an arbitrary intermediate layer.

        Replaces ``embedding_at_tensor``'s graph tensor lookup
        (reference: src/autoencoder.py:263-294) with flax's
        capture_intermediates: ``layer_path`` is a module-path tuple like
        ("decoder", "fc_0", "__call__") or None for the bottleneck.
        """
        if layer_path is None:
            return self.get_latent_vectors(pclouds, batch_size=batch_size)

        @jax.jit
        def capture(state, x):
            _, mods = self.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x,
                train=False,
                capture_intermediates=True,
            )
            node = mods["intermediates"]
            for k in layer_path:
                node = node[k]
            return node[0] if isinstance(node, tuple) else node

        outs = []
        pcs = np.asarray(pclouds, np.float32)
        for s in range(0, len(pcs), batch_size):
            outs.append(np.asarray(capture(self.state, pcs[s : s + batch_size])))
        return np.concatenate(outs)

    def interpolate(self, x, y, steps):
        """reference: src/autoencoder.py:178-189."""
        z = self.transform(np.stack([x, y]))
        alphas = np.linspace(0, 1, steps + 2)[:, None]
        all_z = alphas * z[1] + (1.0 - alphas) * z[0]
        return self.decode(all_z.astype(np.float32))

    # --- training loop (reference: src/autoencoder.py:196-227,
    #     src/pointnet_ae.py:101-138) ------------------------------------
    def _device_epoch_fn(self, n_batches: int, batch_size: int, conf):
        """One whole epoch as a single device program: shuffle (device PRNG)
        + per-batch augmentations (gauss jitter / z-rotate / denoising feed,
        reference: src/general_utils.py:124-144) + lax.scan over the batch
        train steps. Eliminates the per-step dispatch round trip — through a
        remote TPU relay that round trip dominates small-step training
        (measured 0.38 s/step vs ~15 ms of compute at batch 50 x 2048 pts).

        ``feed`` is the denoising input set (== ``data`` when not denoising);
        the same permutation drives both so (feed, gt) pairs stay aligned.
        """
        gauss = conf.gauss_augment
        gauss_mu = None if gauss is None else float(gauss["mu"])
        gauss_sigma = None if gauss is None else float(gauss["sigma"])
        z_rotate = bool(conf.z_rotate)
        augmented = gauss is not None or z_rotate
        is_denoising = bool(conf.is_denoising)

        @jax.jit
        def epoch_fn(state, data, feed, epoch_key):
            n = data.shape[0]
            perm_key, aug_key = jax.random.split(epoch_key)
            perm = jax.random.permutation(perm_key, n)[: n_batches * batch_size]
            bshape = (n_batches, batch_size) + data.shape[1:]
            gt_batches = data[perm].reshape(bshape)
            feed_batches = feed[perm].reshape(bshape)
            aug_keys = jax.random.split(aug_key, n_batches)

            def body(st, inp):
                gt, batch, key = inp
                if self.mesh is not None:
                    # shard the batch axis over the mesh inside the scanned
                    # program (the epoch inputs are replicated); XLA inserts
                    # the gradient all-reduce over ICI/DCN
                    sh = batch_sharding(self.mesh)
                    gt = jax.lax.with_sharding_constraint(gt, sh)
                    batch = jax.lax.with_sharding_constraint(batch, sh)
                if augmented:
                    batch = device_augment(
                        batch, key,
                        gauss_mu=gauss_mu, gauss_sigma=gauss_sigma,
                        z_rotate=z_rotate,
                    )
                    if not is_denoising:
                        # reference fits the augmented batch against ITSELF
                        # (src/pointnet_ae.py:123-128: fit(batch_i) with gt
                        # defaulting to the input) — only denoising configs
                        # reconstruct the clean original.
                        gt = batch
                st, loss, _ = self._train_step(st, batch, gt)
                return st, loss

            state, losses = jax.lax.scan(
                body, state, (gt_batches, feed_batches, aug_keys)
            )
            return state, jnp.mean(losses)

        return epoch_fn

    def _single_epoch(self, train_data, conf, only_fw=False):
        n_batches = train_data.num_examples // conf.batch_size
        epoch_loss = 0.0
        start = time.time()
        for _ in range(n_batches):
            if conf.is_denoising:
                original, _, batch = train_data.next_batch(conf.batch_size)
                if batch is None:
                    batch = original
            else:
                batch, _, _ = train_data.next_batch(conf.batch_size)
                original = None
            batch = apply_augmentations(batch, conf).astype(np.float32)
            if original is None:
                # non-denoising: augmented batch is its own gt
                # (reference: src/pointnet_ae.py:123-128).
                original = batch
            if only_fw:
                _, loss = self.reconstruct(batch, original)
            else:
                _, loss = self.partial_fit(batch, original)
            epoch_loss += loss
        epoch_loss /= max(n_batches, 1)
        if conf.loss == "emd":
            epoch_loss /= train_data.n_points  # reference: pointnet_ae.py:135
        return epoch_loss, time.time() - start

    def train(self, train_data, conf=None, log_file=None, held_out_data=None):
        conf = conf or self.conf
        stats = []

        # Every config takes the scanned path: augmentations and the
        # denoising feed run on device (device_augment). ``scan_epochs=False``
        # remains only as an escape hatch for tests of the host path.
        scan_epochs = getattr(conf, "scan_epochs", True)
        if scan_epochs:
            n_batches = train_data.num_examples // conf.batch_size
            epoch_fn = self._device_epoch_fn(
                n_batches, conf.batch_size, conf
            )
            data_np = train_data.point_clouds.astype(np.float32)
            if conf.is_denoising and train_data.noisy_point_clouds is not None:
                feed_np = train_data.noisy_point_clouds.astype(np.float32)
            else:
                feed_np = data_np
            if self.mesh is not None:
                data_dev = make_global_replicated(data_np, self.mesh)
                feed_dev = (
                    data_dev if feed_np is data_np
                    else make_global_replicated(feed_np, self.mesh)
                )
            else:
                data_dev = jnp.asarray(data_np)
                feed_dev = (
                    data_dev if feed_np is data_np else jnp.asarray(feed_np)
                )
            epoch_key = jax.random.PRNGKey(int(self.state.epoch) + 1)

        for _ in range(conf.training_epochs):
            if scan_epochs:
                t0 = time.time()
                epoch_key, sub = jax.random.split(epoch_key)
                if jax.process_count() > 1:
                    # multi-process jit inputs must be global or host arrays
                    # (a committed single-device key is neither)
                    sub = np.asarray(sub)
                self.state, loss_dev = epoch_fn(
                    self.state, data_dev, feed_dev, sub
                )
                loss = float(loss_dev)
                if conf.loss == "emd":
                    loss /= train_data.n_points  # reference: pointnet_ae.py:135
                duration = time.time() - t0
            else:
                loss, duration = self._single_epoch(train_data, conf)
            self.state = self.state.replace(epoch=self.state.epoch + 1)
            epoch = int(self.state.epoch)
            stats.append((epoch, loss, duration))

            if epoch % conf.loss_display_step == 0:
                msg = (
                    f"Epoch: {epoch:04d} training time (minutes)= "
                    f"{duration / 60.0:.4f} loss= {loss:.9f}"
                )
                print(msg)
                if log_file is not None:
                    log_file.write(
                        "%04d\t%.9f\t%.4f\n" % (epoch, loss, duration / 60.0)
                    )

            if conf.saver_step is not None and (
                epoch % conf.saver_step == 0 or epoch == 1
            ):
                self.save(conf.train_dir, epoch)

            if (
                held_out_data is not None
                and conf.held_out_step is not None
                and epoch % conf.held_out_step == 0
            ):
                ho_loss, ho_dur = self._single_epoch(
                    held_out_data, conf, only_fw=True
                )
                print(
                    f"Held Out Data : forward time (minutes)= "
                    f"{ho_dur / 60.0:.4f} loss= {ho_loss:.9f}"
                )
                if log_file is not None:
                    log_file.write(
                        "On Held_Out: %04d\t%.9f\t%.4f\n"
                        % (epoch, ho_loss, ho_dur / 60.0)
                    )
        return stats

    # --- checkpointing ----------------------------------------------------
    def save(self, train_dir, epoch=None):
        epoch = int(self.state.epoch) if epoch is None else epoch
        if jax.process_count() > 1:
            # orbax coordinates multi-host saves itself (its save protocol
            # runs cross-process barriers, so EVERY process must call it);
            # hand it the global jax.Arrays so the array handler writes each
            # value exactly once from its primary replica
            tree = {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
                "opt_state": self.state.opt_state,
                "epoch": epoch,
            }
            return ckpt.save_checkpoint(train_dir, epoch, tree)
        tree = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "opt_state": jax.device_get(self.state.opt_state),
            "epoch": epoch,
        }
        return ckpt.save_checkpoint(train_dir, epoch, tree)

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
        if tree.get("opt_state") is not None:
            # restore Adam moments + schedule step so a resumed run is an
            # exact continuation (tf.train.Saver restores slot variables)
            self.state = self.state.replace(
                opt_state=jax.tree.map(
                    lambda ref, new: jnp.asarray(new, ref.dtype)
                    if hasattr(ref, "dtype") else new,
                    self.state.opt_state,
                    jax.tree.unflatten(
                        jax.tree.structure(self.state.opt_state),
                        jax.tree.leaves(tree["opt_state"]),
                    ),
                )
            )
        if self.mesh is not None:
            self.state = self._replicate_state(self.state)
        return self


def build_trainer_from_checkpoint(
    conf: Configuration, train_dir: str, epoch: int | None = None, mesh=None
) -> AETrainer:
    trainer = AETrainer(conf, mesh=mesh)
    trainer.restore(train_dir, epoch)
    return trainer
