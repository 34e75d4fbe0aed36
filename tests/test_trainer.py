"""AE trainer: loss decreases, checkpoint roundtrip, sharded data parallel."""

import jax
import numpy as np
import pytest

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


@pytest.mark.slow  # trainer/e2e smoke: full gate only
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


def test_device_augment_matches_host_semantics(rng):
    """device_augment reproduces apply_augmentations' transform family
    (reference: src/general_utils.py:124-144): N(mu, sigma) jitter and one
    whole-batch proper z-rotation."""
    import jax
    import jax.numpy as jnp

    from geometric_adv_tpu.data.augment import device_augment

    batch = jnp.asarray(rng.randn(4, 32, 3), jnp.float32)

    # sigma=0 jitter is a pure mu shift
    shifted = device_augment(
        batch, jax.random.PRNGKey(0), gauss_mu=0.25, gauss_sigma=0.0
    )
    np.testing.assert_allclose(
        np.asarray(shifted), np.asarray(batch) + 0.25, atol=1e-6
    )

    # z-rotation: z untouched, xy radii preserved, one shared proper rotation
    rot = np.asarray(
        device_augment(batch, jax.random.PRNGKey(1), z_rotate=True)
    )
    b = np.asarray(batch)
    np.testing.assert_allclose(rot[..., 2], b[..., 2], atol=1e-6)
    np.testing.assert_allclose(
        (rot[..., :2] ** 2).sum(-1), (b[..., :2] ** 2).sum(-1), atol=1e-4
    )
    # recover the rotation from one point pair; it must map every point
    x0, y0 = b[0, 0, 0], b[0, 0, 1]
    x1, y1 = rot[0, 0, 0], rot[0, 0, 1]
    r2 = x0 * x0 + y0 * y0
    ct = (x0 * x1 + y0 * y1) / r2
    st = (x0 * y1 - y0 * x1) / r2
    mat = np.array([[ct, st, 0], [-st, ct, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(rot, b @ mat, atol=1e-4)
    np.testing.assert_allclose(ct * ct + st * st, 1.0, atol=1e-5)

    # gaussian stats: mean ~ mu, std ~ sigma over a large draw
    big = jnp.zeros((8, 512, 3), jnp.float32)
    noisy = np.asarray(
        device_augment(
            big, jax.random.PRNGKey(2), gauss_mu=0.1, gauss_sigma=0.02
        )
    )
    assert abs(noisy.mean() - 0.1) < 1e-3
    assert abs(noisy.std() - 0.02) < 1e-3


@pytest.mark.slow  # trainer/e2e smoke: full gate only
def test_augmented_training_uses_scan_path(tmp_path):
    """Augmented configs must keep the one-dispatch-per-epoch scan path and
    still learn; the host per-step path remains available via
    scan_epochs=False and behaves equivalently."""
    data = make_data(n=16)

    def run(scan: bool):
        conf = tiny_conf(
            tmp_path, training_epochs=8, z_rotate=False,
            gauss_augment={"mu": 0.0, "sigma": 0.005},
            scan_epochs=scan,
        )
        trainer = AETrainer(conf)
        trainer.train(data, conf)
        return float(np.mean(trainer.get_loss_per_pc(data.point_clouds)))

    loss_scan = run(True)
    loss_host = run(False)
    # both paths train to the same ballpark; same config/init, different
    # RNG streams (jax vs numpy), so equality is not expected
    assert loss_scan < 0.15, loss_scan
    assert loss_host < 0.15, loss_host
    assert abs(loss_scan - loss_host) < 0.1, (loss_scan, loss_host)


def test_denoising_scan_uses_noisy_feed(tmp_path):
    """The scanned epoch must feed noisy_point_clouds as input and the clean
    originals as gt when is_denoising (reference: src/autoencoder.py:105-125
    feed/gt split)."""
    import jax

    conf = tiny_conf(tmp_path, is_denoising=True, training_epochs=1)
    trainer = AETrainer(conf)
    pcs = make_data(n=16).point_clouds
    # a feed set that is obviously not the originals
    noisy = pcs + 10.0
    data = PointCloudDataSet(pcs, noise=noisy, init_shuffle=False)

    # probe step: report the feed-vs-gt distance as the "loss" (pure, so it
    # is safe to substitute inside the jitted epoch program)
    orig_step = trainer._train_step

    def probe_step(state, x, gt):
        return state, jax.numpy.mean(jax.numpy.abs(x - gt)), None

    trainer._train_step = probe_step
    try:
        epoch_fn = trainer._device_epoch_fn(2, conf.batch_size, conf)
        _, mean_diff = epoch_fn(
            trainer.state, jax.numpy.asarray(pcs),
            jax.numpy.asarray(noisy), jax.random.PRNGKey(0),
        )
    finally:
        trainer._train_step = orig_step
    # the feed batches sit exactly 10 away from their aligned gt batches
    assert 9.9 < float(mean_diff) < 10.1, float(mean_diff)


def test_non_denoising_augmented_gt_is_the_augmented_batch(tmp_path):
    """Non-denoising + augmentation: the reference fits the AUGMENTED batch
    against itself (src/pointnet_ae.py:123-128 fit(batch_i), gt defaults to
    the input); only denoising configs reconstruct the clean original. Pin
    that on the scanned epoch, the host epoch, and evaluate() with a pure
    mu-shift augment (sigma=0 => feed = original + mu exactly)."""
    import jax

    mu = 5.0
    conf = tiny_conf(
        tmp_path, training_epochs=1,
        gauss_augment={"mu": mu, "sigma": 0.0},
    )
    trainer = AETrainer(conf)
    pcs = make_data(n=16).point_clouds

    # scanned epoch: probe the (feed, gt) pair the train step receives
    orig_step = trainer._train_step

    def probe_step(state, x, gt):
        return state, jax.numpy.mean(jax.numpy.abs(x - gt)), None

    trainer._train_step = probe_step
    try:
        epoch_fn = trainer._device_epoch_fn(2, conf.batch_size, conf)
        _, mean_diff = epoch_fn(
            trainer.state, jax.numpy.asarray(pcs),
            jax.numpy.asarray(pcs), jax.random.PRNGKey(0),
        )
    finally:
        trainer._train_step = orig_step
    assert float(mean_diff) < 1e-6, float(mean_diff)  # gt == augmented feed

    # host epoch: probe the (feed, gt) pair reconstruct receives — it must
    # be (augmented, augmented), i.e. zero distance between them
    data = PointCloudDataSet(pcs, init_shuffle=False)
    orig_recon = trainer.reconstruct

    def probe_recon(x, gt=None, compute_loss=True):
        gt = x if gt is None else gt
        return None, float(np.mean(np.abs(np.asarray(x) - np.asarray(gt))))

    trainer.reconstruct = probe_recon
    try:
        feed_gt_diff, _ = trainer._single_epoch(data, conf, only_fw=True)
    finally:
        trainer.reconstruct = orig_recon
    assert feed_gt_diff < 1e-6, feed_gt_diff

    # evaluate(): loss must match scoring the shifted feed against itself
    recon, ev_loss, feed, _, original = trainer.evaluate(data, conf)
    np.testing.assert_allclose(feed, original + mu, atol=1e-6)
    manual = float(np.mean(trainer.get_loss_per_pc(feed, feed)))
    np.testing.assert_allclose(ev_loss, manual, rtol=1e-6)


def test_from_reference_txt(tmp_path):
    # Emulate the reference's dump format byte-for-byte: sorted keys,
    # "%30s: %s" per line, callables dumped by __name__, np scalars via str()
    # (reference: src/autoencoder.py:62-73). Victim + attack-stage fields.
    ref_fields = {
        "n_input": [2048, 3],
        "n_output": [2048, 3],
        "is_denoising": False,
        "loss": "chamfer",
        "encoder": "encoder_with_convs_and_symmetry",
        "decoder": "decoder_with_fc_only",
        "encoder_args": {
            "n_filters": [64, 128, 128, 256, 128],
            "filter_sizes": [1],
            "strides": [1],
            "b_norm": True,
            "verbose": True,
            "b_norm_decay": 1.0,
            "return_layer_before_symmetry": False,
        },
        "decoder_args": {
            "layer_sizes": [256, 256, 6144],
            "b_norm": False,
            "b_norm_finish": False,
            "verbose": True,
            "b_norm_decay": 1.0,
            "b_norm_decay_finish": 1.0,
        },
        "batch_size": 10,
        "learning_rate": 0.01,
        "loss_display_step": 1,
        "saver_step": 50,
        "train_dir": "log/autoencoder_victim/eval/output_space_attack",
        "gauss_augment": None,
        "z_rotate": False,
        "saver_max_to_keep": None,
        "training_epochs": 500,
        "debug": False,
        "latent_vs_recon": 1.0,
        "n_z": None,
        "consistent_io": None,
        "experiment_name": "adversary",
        "ae_dir": "log/autoencoder_victim",
        "ae_name": "autoencoder",
        "ae_restore_epoch": 500,
        "loss_adv_type": "latent",
        "loss_dist_type": "chamfer",
        "dist_weight_list": [150.0],
        "max_point_pert_weight": 0.0,
        "max_point_dist_weight": 0.0,
        "target_pc_idx_type": "chamfer_nn_complete",
        "num_pc_for_attack": 25,
        "num_pc_for_target": 5,
        "correct_pred_only": False,
        "num_iterations": 500,
        "num_iterations_thresh": 400,
    }
    path = tmp_path / "attack_configuration.txt"
    lines = [
        "%30s: %s" % (k, ref_fields[k]) for k in sorted(ref_fields)
    ]
    path.write_text("\n".join(lines) + "\n")

    conf = Configuration.from_reference_txt(str(path))

    # architecture translated from the tflearn arg dicts
    assert conf.encoder_filters == [64, 128, 128, 256, 128]
    assert conf.bneck_size == 128
    assert conf.decoder_sizes == [256, 256]  # final n*3 layer is implicit
    assert conf.b_norm_decay == 1.0  # the frozen-BN attack setting
    # 1:1 fields
    assert conf.n_input == [2048, 3]
    assert conf.loss == "chamfer"
    assert conf.batch_size == 10
    assert conf.learning_rate == 0.01
    assert conf.training_epochs == 500
    assert conf.is_denoising is False and conf.z_rotate is False
    assert conf.gauss_augment is None
    # attack-stage fields
    assert conf.loss_adv_type == "latent"
    assert conf.dist_weight_list == [150.0]
    assert conf.num_iterations == 500
    assert conf.num_iterations_thresh == 400
    assert conf.ae_restore_epoch == 500
    assert conf.experiment_name == "adversary"
    # graph-building leftovers preserved, not dropped
    assert conf.extra["reference_encoder"] == "encoder_with_convs_and_symmetry"
    assert conf.extra["reference_decoder_args"]["layer_sizes"] == [256, 256, 6144]

    # the imported config drives the real model constructor
    trainer = AETrainer(
        Configuration.from_dict(
            {**conf.to_dict(), "n_input": [64, 3], "encoder_filters": [16, 16],
             "bneck_size": 16, "decoder_sizes": [32], "batch_size": 4,
             "saver_step": None, "train_dir": None}
        )
    )
    assert trainer.state is not None


def test_interpolate(tmp_path):
    # reference: src/autoencoder.py:178-189 — linear latent interpolation
    # with steps+2 points whose endpoints decode z(x) and z(y) exactly.
    conf = tiny_conf(tmp_path)
    trainer = AETrainer(conf)
    data = make_data(n=4)
    x, y = data.point_clouds[0], data.point_clouds[1]

    steps = 3
    out = trainer.interpolate(x, y, steps)
    assert out.shape == (steps + 2, conf.n_points, 3)

    z = trainer.transform(np.stack([x, y]))
    np.testing.assert_allclose(out[0], trainer.decode(z[0])[0], atol=1e-6)
    np.testing.assert_allclose(out[-1], trainer.decode(z[1])[0], atol=1e-6)
    mid = trainer.decode((0.5 * z[0] + 0.5 * z[1])[None])
    np.testing.assert_allclose(out[(steps + 2) // 2], mid[0], atol=1e-6)
