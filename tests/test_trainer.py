"""AE trainer: loss decreases, checkpoint roundtrip, sharded data parallel."""

import jax
import numpy as np

from geometric_adv_tpu.data import PointCloudDataSet
from geometric_adv_tpu.data.synthetic import make_dataset
from geometric_adv_tpu.parallel import get_mesh
from geometric_adv_tpu.train import AETrainer, Configuration


def tiny_conf(tmp_path=None, **kw):
    defaults = dict(
        n_input=[64, 3],
        bneck_size=16,
        encoder_filters=[16, 32, 16],
        decoder_sizes=[32, 32],
        batch_size=8,
        training_epochs=3,
        learning_rate=0.005,
        saver_step=None,
        held_out_step=None,
        train_dir=str(tmp_path) if tmp_path else None,
    )
    defaults.update(kw)
    return Configuration(**defaults)


def make_data(n=24, n_points=64):
    pcs, _, _, _ = make_dataset(
        class_names=("sphere", "cube"), n_per_class=n // 2, n_points=n_points
    )
    return PointCloudDataSet(pcs, init_shuffle=False)


def test_training_reduces_loss(tmp_path):
    conf = tiny_conf(tmp_path, training_epochs=8)
    trainer = AETrainer(conf)
    data = make_data()
    loss0 = float(np.mean(trainer.get_loss_per_pc(data.point_clouds)))
    trainer.train(data, conf)
    loss1 = float(np.mean(trainer.get_loss_per_pc(data.point_clouds)))
    assert loss1 < loss0 * 0.8, (loss0, loss1)


def test_checkpoint_roundtrip(tmp_path):
    conf = tiny_conf(tmp_path, training_epochs=2, saver_step=2)
    trainer = AETrainer(conf)
    data = make_data()
    trainer.train(data, conf)
    recon_before = trainer.get_reconstructions(data.point_clouds[:4])

    trainer2 = AETrainer(conf, seed=123)  # different init
    trainer2.restore(conf.train_dir, epoch=2)
    recon_after = trainer2.get_reconstructions(data.point_clouds[:4])
    np.testing.assert_allclose(recon_before, recon_after, atol=1e-6)
    assert int(trainer2.state.epoch) == 2


def test_emd_loss_training_step():
    conf = tiny_conf(loss="emd", training_epochs=1)
    trainer = AETrainer(conf)
    data = make_data(n=16)
    _, loss = trainer.partial_fit(data.point_clouds[:8])
    assert np.isfinite(loss) and loss > 0


def test_data_parallel_training_on_mesh():
    """Batch-sharded train step over the virtual 8-device CPU mesh — values
    must match the single-device run (same init, same batches)."""
    mesh = get_mesh()
    assert mesh.devices.size == 8, "conftest must expose 8 CPU devices"
    conf = tiny_conf(batch_size=16)

    single = AETrainer(conf, seed=7)
    sharded = AETrainer(conf, mesh=mesh, seed=7)

    data = make_data(n=16)
    x = data.point_clouds.astype(np.float32)

    r_single, loss_single = single.partial_fit(x)
    from geometric_adv_tpu.parallel import shard_batch

    xs = shard_batch(x, mesh)
    sharded.state, loss_sharded, r_sharded = sharded._jit_train_step(
        sharded.state, xs, xs
    )
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=1e-5
    )
    np.testing.assert_allclose(
        r_single, np.asarray(r_sharded), atol=1e-4
    )

    # params after the sharded update match the single-device update.
    # Exception: encoder Dense biases are exactly cancelled by the following
    # BatchNorm, so their true gradient is zero and Adam's first step on
    # pure numerical noise is +-lr in an arbitrary direction — reduction
    # order (sharded vs single) legitimately flips it. Skip those leaves.
    diffs = jax.tree.map(
        lambda a, b: np.abs(np.asarray(a) - np.asarray(b)).max(),
        single.state.params,
        jax.device_get(sharded.state.params),
    )
    flat, _ = jax.tree_util.tree_flatten_with_path(diffs)
    for path, diff in flat:
        keys = [getattr(p, "key", "") for p in path]
        if "encoder" in keys and "bias" in keys:
            continue
        assert diff < 1e-4, (keys, diff)


def test_batched_inference_pads_ragged_batches():
    mesh = get_mesh()
    conf = tiny_conf()
    trainer = AETrainer(conf, mesh=mesh)
    x = make_data(n=10).point_clouds  # 10 not divisible by 8
    recon = trainer.get_reconstructions(x, batch_size=6)
    assert recon.shape == (10, 64, 3)


def test_evaluate_method(tmp_path):
    """AETrainer.evaluate parity surface
    (reference: src/autoencoder.py:229-261)."""
    conf = tiny_conf(tmp_path)
    trainer = AETrainer(conf)
    data = make_data(n=12)
    recon, loss, feed, ids, original = trainer.evaluate(data, conf)
    assert recon.shape == (12, 64, 3)
    assert np.isfinite(loss)
    np.testing.assert_array_equal(original, data.point_clouds)


def test_embedding_at_layer(tmp_path):
    """embedding_at_tensor parity via capture_intermediates
    (reference: src/autoencoder.py:263-294)."""
    conf = tiny_conf(tmp_path)
    trainer = AETrainer(conf)
    x = make_data(n=6).point_clouds
    z = trainer.embedding_at_layer(x)  # bottleneck
    assert z.shape == (6, 16)
    fc0 = trainer.embedding_at_layer(x, ("decoder", "fc_0", "__call__"))
    assert fc0.shape == (6, 32)
    pre = trainer.embedding_at_layer(x, ("encoder", "__call__"))
    assert pre.shape == (6, 64, 16)


def test_denoising_training_with_augmentations(tmp_path):
    """Denoising AE path: gauss_augment corrupts the input, loss targets the
    clean original (reference: src/pointnet_ae.py:116-127,
    src/autoencoder.py:105-125)."""
    conf = tiny_conf(
        tmp_path, is_denoising=True, training_epochs=10,
        gauss_augment={"mu": 0.0, "sigma": 0.01},
    )
    trainer = AETrainer(conf)
    data = make_data(n=16)
    loss0 = float(np.mean(trainer.get_loss_per_pc(data.point_clouds)))
    trainer.train(data, conf)
    loss1 = float(np.mean(trainer.get_loss_per_pc(data.point_clouds)))
    assert loss1 < loss0, (loss0, loss1)

    # z_rotate path executes (mechanics only; convergence under random
    # rotation needs far more steps than a smoke test)
    conf.z_rotate = True
    trainer._single_epoch(data, conf)
