"""Reference TF1-checkpoint importer (train/import_tf.py).

Two layers of coverage:

- pure-numpy mapping tests (no TF): the name-mapping produces exactly the
  tree layout ``PointNetAE.init`` produces, values land on the right
  leaves, and the error paths fire;
- a real TF round trip (skipped when `tensorflow` is absent): variables
  with the reference's names (reference: src/encoders_decoders.py:40-52,
  101-141; src/pointnet_ae.py:35; src/neural_net.py:22-25) are written with
  ``tf.compat.v1.train.Saver`` — the exact on-disk format of
  download_models_and_data.sh's pretrained models — imported, restored via
  ``AETrainer.restore``, and the restored forward is checked against an
  independent numpy implementation of the reference architecture.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes-scale; quick tier runs -m "not slow"

from geometric_adv_tpu.train import Configuration
from geometric_adv_tpu.train.import_tf import (
    detect_model_scope,
    import_reference_checkpoint,
    import_reference_classifier_checkpoint,
    map_reference_ae_variables,
    map_reference_classifier_variables,
)

ENC = (8, 12, 6)  # last = bneck
DEC = (10, 5 * 3)  # final layer = n_points*3
N_POINTS = 5


def small_conf(train_dir=None):
    return Configuration(
        n_input=[N_POINTS, 3],
        bneck_size=ENC[-1],
        encoder_filters=list(ENC),
        decoder_sizes=list(DEC[:-1]),
        batch_size=2,
        train_dir=train_dir,
        saver_step=None,
    )


def make_ref_vars(
    scope="autoencoder", seed=0, conv_rank4=True, epoch=500.0,
    enc=ENC, dec=DEC,
):
    """A synthetic reference-named variable dict for the small victim arch."""
    rng = np.random.RandomState(seed)
    v = {}
    c_in = 3
    for i, width in enumerate(enc):
        base = f"{scope}/encoder_conv_layer_{i}"
        w = rng.randn(c_in, width).astype(np.float32) * 0.5
        # tflearn conv_1d stores filters 4-D [1, filter_size=1, in, out]
        v[f"{base}/W"] = w.reshape((1, 1, c_in, width)) if conv_rank4 else w
        v[f"{base}/b"] = rng.randn(width).astype(np.float32) * 0.1
        v[f"{base}_bnorm/beta"] = rng.randn(width).astype(np.float32) * 0.1
        v[f"{base}_bnorm/gamma"] = (
            1.0 + rng.randn(width).astype(np.float32) * 0.1
        )
        v[f"{base}_bnorm/moving_mean"] = (
            rng.randn(width).astype(np.float32) * 0.1
        )
        v[f"{base}_bnorm/moving_variance"] = (
            1.0 + rng.rand(width).astype(np.float32)
        )
        c_in = width
    for j, width in enumerate(dec):
        base = f"{scope}/decoder_fc_{j}"
        v[f"{base}/W"] = rng.randn(c_in, width).astype(np.float32) * 0.5
        v[f"{base}/b"] = rng.randn(width).astype(np.float32) * 0.1
        c_in = width
    if epoch is not None:
        v[f"{scope}/epoch"] = np.float32(epoch)
    # optimizer slots must be ignored by the mapping
    v[f"{scope}/encoder_conv_layer_0/W/Adam"] = np.zeros(
        (1, 1, 3, enc[0]), np.float32
    )
    v["beta1_power"] = np.float32(0.9)
    return v


def numpy_reference_forward(v, x, scope="autoencoder"):
    """The reference AE forward (inference-mode BN), straight numpy."""
    h = x
    for i in range(len(ENC)):
        base = f"{scope}/encoder_conv_layer_{i}"
        h = h @ v[f"{base}/W"].reshape(v[f"{base}/W"].shape[-2:]) + v[
            f"{base}/b"
        ]
        mean = v[f"{base}_bnorm/moving_mean"]
        var = v[f"{base}_bnorm/moving_variance"]
        h = (h - mean) / np.sqrt(var + 1e-5) * v[f"{base}_bnorm/gamma"] + v[
            f"{base}_bnorm/beta"
        ]
        h = np.maximum(h, 0.0)
    z = h.max(axis=-2)
    h = z
    for j in range(len(DEC)):
        base = f"{scope}/decoder_fc_{j}"
        h = h @ v[f"{base}/W"] + v[f"{base}/b"]
        if j < len(DEC) - 1:
            h = np.maximum(h, 0.0)
    return h.reshape(x.shape[:-2] + (N_POINTS, 3)), z


def test_mapping_matches_model_tree_and_values():
    import jax

    from geometric_adv_tpu.train.trainer import AETrainer

    v = make_ref_vars()
    params, batch_stats, epoch = map_reference_ae_variables(v)
    assert epoch == 500

    ref = AETrainer(small_conf())
    shapes = lambda t: jax.tree.map(lambda a: tuple(np.shape(a)), t)  # noqa: E731
    assert shapes(params) == shapes(jax.device_get(ref.state.params))
    assert shapes(batch_stats) == shapes(
        jax.device_get(ref.state.batch_stats)
    )
    # values land on the right leaves (kernel squeezed from the 4-D filter)
    np.testing.assert_array_equal(
        params["encoder"]["conv_1"]["kernel"],
        v["autoencoder/encoder_conv_layer_1/W"][0, 0],
    )
    np.testing.assert_array_equal(
        params["encoder"]["bn_2"]["scale"],
        v["autoencoder/encoder_conv_layer_2_bnorm/gamma"],
    )
    np.testing.assert_array_equal(
        batch_stats["encoder"]["bn_0"]["var"],
        v["autoencoder/encoder_conv_layer_0_bnorm/moving_variance"],
    )
    np.testing.assert_array_equal(
        params["decoder"]["fc_1"]["bias"], v["autoencoder/decoder_fc_1/b"]
    )


def test_mapped_forward_equals_numpy_reference():
    v = make_ref_vars(seed=3)
    params, batch_stats, _ = map_reference_ae_variables(v)

    from geometric_adv_tpu.train.trainer import AETrainer

    trainer = AETrainer(small_conf())
    trainer.state = trainer.state.replace(
        params=params, batch_stats=batch_stats
    )
    x = np.random.RandomState(7).rand(4, N_POINTS, 3).astype(np.float32)
    recon = np.asarray(trainer.get_reconstructions(x, batch_size=4))
    z = np.asarray(trainer.get_latent_vectors(x, batch_size=4))
    want_recon, want_z = numpy_reference_forward(v, x)
    np.testing.assert_allclose(z, want_z, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(recon, want_recon, rtol=2e-5, atol=2e-5)


def test_scope_detection_and_errors():
    v = make_ref_vars(scope="single_class_ae")
    assert detect_model_scope(v) == "single_class_ae"
    params, _, _ = map_reference_ae_variables(v, ae_name="single_class_ae")
    assert set(params) == {"encoder", "decoder"}

    with pytest.raises(ValueError, match="not a reference"):
        detect_model_scope({"foo/W": np.zeros((1,))})
    with pytest.raises(ValueError, match="wrong scope"):
        map_reference_ae_variables(v, ae_name="nope")
    # non-unit filter dims must be rejected, not silently reshaped
    bad = make_ref_vars()
    bad["autoencoder/encoder_conv_layer_0/W"] = np.zeros(
        (2, 1, 3, ENC[0]), np.float32
    )
    with pytest.raises(ValueError, match="unit filter"):
        map_reference_ae_variables(bad)


def _write_tf1_checkpoint(tf, v, prefix):
    tf1 = tf.compat.v1
    g = tf1.Graph()
    with g.as_default():
        tf_vars = [
            tf1.Variable(initial_value=val, name=name, trainable=False)
            for name, val in v.items()
        ]
        # drop the :0 / uniquification — Saver keys by op name, which for
        # these freshly created variables is exactly the requested name
        for var, name in zip(tf_vars, v):
            assert var.op.name == name, (var.op.name, name)
        saver = tf1.train.Saver(var_list=tf_vars)
        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            return saver.save(sess, prefix, write_meta_graph=False)


def test_tf_checkpoint_roundtrip(tmp_path):
    tf = pytest.importorskip("tensorflow")

    v = make_ref_vars(seed=11)
    prefix = _write_tf1_checkpoint(
        tf, v, str(tmp_path / "ref" / "models.ckpt-500")
    )
    assert prefix.endswith("models.ckpt-500")

    train_dir = str(tmp_path / "imported")
    conf = small_conf(train_dir)
    path, epoch = import_reference_checkpoint(
        prefix, train_dir, conf=conf
    )
    assert epoch == 500

    from geometric_adv_tpu.train.trainer import build_trainer_from_checkpoint

    trainer = build_trainer_from_checkpoint(conf, train_dir, epoch=500)
    assert int(trainer.state.epoch) == 500
    x = np.random.RandomState(5).rand(3, N_POINTS, 3).astype(np.float32)
    recon = np.asarray(trainer.get_reconstructions(x, batch_size=3))
    want_recon, _ = numpy_reference_forward(v, x)
    np.testing.assert_allclose(recon, want_recon, rtol=2e-5, atol=2e-5)


def test_tf_checkpoint_cli(tmp_path, monkeypatch, capsys):
    tf = pytest.importorskip("tensorflow")

    v = make_ref_vars(seed=13)
    prefix = _write_tf1_checkpoint(
        tf, v, str(tmp_path / "ref" / "models.ckpt-500")
    )
    # a reference-format configuration.txt for the small arch
    conf_txt = tmp_path / "configuration.txt"
    conf_txt.write_text(
        "".join(
            "%30s: %s\n" % (k, val)
            for k, val in [
                ("n_input", list((N_POINTS, 3))),
                ("encoder_args", {"n_filters": list(ENC), "b_norm": True}),
                ("decoder_args", {"layer_sizes": list(DEC), "b_norm": False}),
                ("batch_size", 2),
                ("learning_rate", 0.0005),
                ("loss", "chamfer"),
                ("training_epochs", 500),
            ]
        )
    )

    from geometric_adv_tpu.cli import import_reference_ckpt as cli

    monkeypatch.setattr(
        "sys.argv",
        [
            "import_reference_ckpt",
            "--reference_ckpt", prefix,
            "--reference_config", str(conf_txt),
            "--project_dir", str(tmp_path),
            "--train_folder", "log/victim",
        ],
    )
    cli.main()
    out = capsys.readouterr().out
    assert "imported epoch 500" in out

    restored = Configuration.load(
        str(tmp_path / "log" / "victim" / "configuration")
    )
    assert restored.encoder_filters == list(ENC)

    from geometric_adv_tpu.train.trainer import build_trainer_from_checkpoint

    restored.train_dir = str(tmp_path / "log" / "victim")
    trainer = build_trainer_from_checkpoint(
        restored, restored.train_dir, epoch=500
    )
    x = np.random.RandomState(2).rand(2, N_POINTS, 3).astype(np.float32)
    recon = np.asarray(trainer.get_reconstructions(x, batch_size=2))
    want_recon, _ = numpy_reference_forward(v, x)
    np.testing.assert_allclose(recon, want_recon, rtol=2e-5, atol=2e-5)


def test_prefix_suffix_guard(tmp_path):
    with pytest.raises(SystemExit, match="PREFIX"):
        from geometric_adv_tpu.cli import import_reference_ckpt as cli
        import sys

        old = sys.argv
        sys.argv = [
            "x", "--reference_ckpt", "models.ckpt-500.index",
            "--project_dir", str(tmp_path),
        ]
        try:
            cli.main()
        finally:
            sys.argv = old


# --- classifier checkpoints -------------------------------------------------

N_CLS = 4
CLS_N_POINTS = 8
# (scope, c_in, c_out, conv_kernel_shape|None for fc) per layer, exactly the
# variable set listed from building the reference graph (see
# train/import_tf.py's classifier section)
_TNET = lambda scope, c0, kdim: [  # noqa: E731
    (f"{scope}/tconv1", (1, kdim, 1, 64) if kdim == 3 else (1, 1, c0, 64), True),
    (f"{scope}/tconv2", (1, 1, 64, 128), True),
    (f"{scope}/tconv3", (1, 1, 128, 1024), True),
    (f"{scope}/tfc1", (1024, 512), True),
    (f"{scope}/tfc2", (512, 256), True),
]


def make_cls_vars(seed=0, use_tnets=True):
    rng = np.random.RandomState(seed)
    v = {}

    def add(base, shape, bn):
        out = shape[-1]
        # fan-in scaling keeps activations O(1) through the 1024-wide
        # layers — unscaled random weights blow the logits up to ~1e6,
        # where f32 summation-order noise swamps any sane tolerance
        w_scale = np.float32(0.7 / np.sqrt(np.prod(shape[:-1])))
        v[f"{base}/weights"] = (
            rng.randn(*shape).astype(np.float32) * w_scale
        )
        v[f"{base}/biases"] = rng.randn(out).astype(np.float32) * 0.05
        if bn:
            v[f"{base}/bn/beta"] = rng.randn(out).astype(np.float32) * 0.05
            v[f"{base}/bn/gamma"] = (
                1 + rng.randn(out).astype(np.float32) * 0.05
            )
            sh = f"{base}/bn/{base}/bn/moments"
            v[f"{sh}/Squeeze/ExponentialMovingAverage"] = (
                rng.randn(out).astype(np.float32) * 0.05
            )
            v[f"{sh}/Squeeze_1/ExponentialMovingAverage"] = (
                1 + rng.rand(out).astype(np.float32) * 0.2
            )

    if use_tnets:
        for layer, shape, bn in _TNET("transform_net1", 3, 3):
            add(layer, shape, bn)
        add("transform_net1/transform_XYZ", (256, 9), False)
        for layer, shape, bn in _TNET("transform_net2", 64, 1):
            add(layer, shape, bn)
        add("transform_net2/transform_feat", (256, 64 * 64), False)
    add("conv1", (1, 3, 1, 64), True)
    add("conv2", (1, 1, 64, 64), True)
    add("conv3", (1, 1, 64, 64), True)
    add("conv4", (1, 1, 64, 128), True)
    add("conv5", (1, 1, 128, 1024), True)
    add("fc1", (1024, 512), True)
    add("fc2", (512, 256), True)
    add("fc3", (256, N_CLS), False)
    return v


def _np_cls_dense(v, base, h):
    w = v[f"{base}/weights"]
    w = w.reshape(w.shape[-2:]) if w.shape[:-2] == (1, 1) else np.squeeze(w)
    return h @ w + v[f"{base}/biases"]


def _np_cls_bn(v, base, h):
    sh = f"{base}/bn/{base}/bn/moments"
    mean = v[f"{sh}/Squeeze/ExponentialMovingAverage"]
    var = v[f"{sh}/Squeeze_1/ExponentialMovingAverage"]
    # reference BN epsilon is 1e-3 (classifier/tf_util.py:500)
    return (h - mean) / np.sqrt(var + 1e-3) * v[f"{base}/bn/gamma"] + v[
        f"{base}/bn/beta"
    ]


def _np_tnet(v, scope, h, k, final):
    for name in ("tconv1", "tconv2", "tconv3"):
        h = np.maximum(_np_cls_bn(v, f"{scope}/{name}",
                                  _np_cls_dense(v, f"{scope}/{name}", h)), 0)
    h = h.max(axis=-2)
    for name in ("tfc1", "tfc2"):
        h = np.maximum(_np_cls_bn(v, f"{scope}/{name}",
                                  _np_cls_dense(v, f"{scope}/{name}", h)), 0)
    t = _np_cls_dense(v, f"{scope}/{final}", h) + np.eye(
        k, dtype=np.float32
    ).reshape(-1)
    return t.reshape(t.shape[:-1] + (k, k))


def numpy_classifier_forward(v, x):
    """Reference classifier forward (inference mode), straight numpy."""
    t1 = _np_tnet(v, "transform_net1", x, 3, "transform_XYZ")
    h = np.einsum("bnc,bck->bnk", x, t1)
    for name in ("conv1", "conv2"):
        h = np.maximum(_np_cls_bn(v, name, _np_cls_dense(v, name, h)), 0)
    t2 = _np_tnet(v, "transform_net2", h, 64, "transform_feat")
    h = np.einsum("bnc,bck->bnk", h, t2)
    for name in ("conv3", "conv4", "conv5"):
        h = np.maximum(_np_cls_bn(v, name, _np_cls_dense(v, name, h)), 0)
    h = h.max(axis=-2)
    for name in ("fc1", "fc2"):
        h = np.maximum(_np_cls_bn(v, name, _np_cls_dense(v, name, h)), 0)
    return _np_cls_dense(v, "fc3", h)


def test_classifier_mapping_matches_model_tree():
    import jax

    from geometric_adv_tpu.classify.trainer import ClassifierTrainer

    v = make_cls_vars()
    params, stats, use_tnets = map_reference_classifier_variables(v)
    assert use_tnets

    trainer = ClassifierTrainer(num_classes=N_CLS, num_points=CLS_N_POINTS)
    shapes = lambda t: jax.tree.map(lambda a: tuple(np.shape(a)), t)  # noqa: E731
    assert shapes(params) == shapes(jax.device_get(trainer.state.params))
    assert shapes(stats) == shapes(jax.device_get(trainer.state.batch_stats))
    # the [1,3,1,64] coordinate conv squeezes to the [3,64] Dense kernel
    np.testing.assert_array_equal(
        params["conv1"]["kernel"], v["conv1/weights"][0, :, 0, :]
    )
    np.testing.assert_array_equal(
        stats["fc2_bn"]["var"],
        v["fc2/bn/fc2/bn/moments/Squeeze_1/ExponentialMovingAverage"],
    )
    np.testing.assert_array_equal(
        params["transform_net2"]["transform"]["bias"],
        v["transform_net2/transform_feat/biases"],
    )


def test_classifier_mapping_basic_variant():
    import jax

    from geometric_adv_tpu.models.pointnet_cls import PointNetClassifier

    v = make_cls_vars(use_tnets=False)
    params, stats, use_tnets = map_reference_classifier_variables(v)
    assert not use_tnets

    model = PointNetClassifier(num_classes=N_CLS, use_tnets=False)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, CLS_N_POINTS, 3), np.float32),
        train=False,
    )
    shapes = lambda t: jax.tree.map(lambda a: tuple(np.shape(a)), t)  # noqa: E731
    assert shapes(params) == shapes(jax.device_get(variables["params"]))
    assert shapes(stats) == shapes(jax.device_get(variables["batch_stats"]))


def test_classifier_logits_equal_numpy_reference():
    from geometric_adv_tpu.classify.trainer import ClassifierTrainer

    v = make_cls_vars(seed=21)
    params, stats, _ = map_reference_classifier_variables(v)
    trainer = ClassifierTrainer(num_classes=N_CLS, num_points=CLS_N_POINTS)
    trainer.state = trainer.state.replace(params=params, batch_stats=stats)

    x = np.random.RandomState(9).rand(6, CLS_N_POINTS, 3).astype(np.float32)
    logits = trainer._jit_logits(trainer.state, x)
    want = numpy_classifier_forward(v, x)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=1e-4, atol=5e-4)
    preds = trainer.classify(x)
    np.testing.assert_array_equal(preds, want.argmax(axis=-1))


def test_classifier_tf_checkpoint_roundtrip(tmp_path):
    tf = pytest.importorskip("tensorflow")

    v = make_cls_vars(seed=33)
    prefix = _write_tf1_checkpoint(
        tf, v, str(tmp_path / "ref" / "model-150.ckpt")
    )
    assert prefix.endswith("model-150.ckpt")

    train_dir = str(tmp_path / "imported_cls")
    path, epoch, num_classes, use_tnets = (
        import_reference_classifier_checkpoint(prefix, train_dir)
    )
    assert (epoch, num_classes, use_tnets) == (150, N_CLS, True)

    from geometric_adv_tpu.classify.trainer import ClassifierTrainer

    trainer = ClassifierTrainer(num_classes=N_CLS, num_points=CLS_N_POINTS)
    trainer.restore(train_dir, epoch=150)
    assert int(trainer.state.epoch) == 150
    x = np.random.RandomState(4).rand(3, CLS_N_POINTS, 3).astype(np.float32)
    logits = trainer._jit_logits(trainer.state, x)
    want = numpy_classifier_forward(v, x)
    np.testing.assert_allclose(np.asarray(logits), want, rtol=1e-4, atol=5e-4)


def test_classifier_cli_branch(tmp_path, monkeypatch, capsys):
    tf = pytest.importorskip("tensorflow")

    v = make_cls_vars(seed=40)
    prefix = _write_tf1_checkpoint(
        tf, v, str(tmp_path / "ref" / "model-150.ckpt")
    )
    from geometric_adv_tpu.cli import import_reference_ckpt as cli

    monkeypatch.setattr(
        "sys.argv",
        ["x", "--model", "classifier", "--reference_ckpt", prefix,
         "--project_dir", str(tmp_path), "--train_folder", "log/pointnet"],
    )
    cli.main()
    out = capsys.readouterr().out
    assert "imported classifier epoch 150 (4 classes, full model)" in out
    assert "--classifier_restore_epoch 150" in out


# --- imported-TF victim -> attack replay (golden) ---------------------------

def _run_cli(module, *args):
    """Run a stage CLI as a subprocess on CPU (same recipe as
    tests/test_cli_pipeline.py — duplicated because test modules aren't a
    package)."""
    import os
    import subprocess
    import sys

    repo = osp_dirname(osp_dirname(osp_abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, "-m", f"geometric_adv_tpu.cli.{module}", *args],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, (
        f"{module} failed:\nSTDOUT:\n{result.stdout[-3000:]}\n"
        f"STDERR:\n{result.stderr[-3000:]}"
    )
    return result.stdout


from os.path import abspath as osp_abspath  # noqa: E402
from os.path import dirname as osp_dirname  # noqa: E402
from os.path import exists as osp_exists  # noqa: E402
from os.path import join as osp_join  # noqa: E402

GOLDEN_DIR = osp_join(osp_dirname(osp_abspath(__file__)), "golden")


def test_imported_tf_victim_attack_replay(tmp_path):
    """The full rehearsal for replaying the reference's pretrained tree
    (VERDICT r3 #8): write a reference-format TF1 victim checkpoint, import
    it (train/import_tf.py), produce the eval artifacts with the IMPORTED
    weights (tst_ae), and run the attack CLI against it — the resulting
    adversarial_metrics are bit-compared to a checked-in golden. When the
    real download_models_and_data.sh tree becomes available, only the
    checkpoint source changes; every stage after the import is exercised
    here exactly as it would run then."""
    pytest.importorskip("tensorflow")
    import tensorflow as tf

    n_pts, enc, dec = 64, (8, 12, 6), (10, 64 * 3)
    v = make_ref_vars(seed=17, enc=enc, dec=dec)
    prefix = _write_tf1_checkpoint(
        tf, v, str(tmp_path / "ref" / "models.ckpt-500")
    )

    d = str(tmp_path)
    ae = "log/imported_victim"
    train_dir = osp_join(d, ae)
    conf = Configuration(
        n_input=[n_pts, 3],
        bneck_size=enc[-1],
        encoder_filters=list(enc),
        decoder_sizes=list(dec[:-1]),
        batch_size=8,
        train_dir=train_dir,
        saver_step=None,
        class_names=["sphere", "cube", "torus"],
    )
    path, epoch = import_reference_checkpoint(prefix, train_dir, conf=conf)
    assert epoch == 500
    conf.save(osp_join(train_dir, "configuration"))

    common = ["--project_dir", d]
    _run_cli("make_synthetic_data", *common, "--data_folder", "data/tiny",
             "--class_names", "sphere", "cube", "torus",
             "--n_per_class", "40", "--n_points", str(n_pts))
    _run_cli("tst_ae", *common, "--data_folder", "data/tiny",
             "--train_folder", ae, "--restore_epoch", "500")
    _run_cli("prepare_indices_for_attack", *common, "--ae_folder", ae,
             "--get_rand_idx", "1", "--get_latent_nn_idx", "1",
             "--get_chamfer_nn_idx", "1", "--num_instance_per_class", "4")
    sel = f"{ae}/eval/sel_idx_rand_4_test_set_13l.npy"
    _run_cli("run_attack", *common, "--ae_folder", ae,
             "--attack_pc_idx", sel, "--num_pc_for_attack", "2",
             "--num_pc_for_target", "2", "--num_iterations", "5",
             "--num_iterations_thresh", "3", "--use_mesh", "0")

    src = osp_join(d, ae, "eval", "attack_res", "sphere",
                   "adversarial_metrics.npy")
    m = np.load(src)
    assert m.shape == (1, 8, 5) and np.isfinite(m).all()

    import os
    import shutil

    name = "adversarial_metrics_imported_tf_sphere.npy"
    golden = osp_join(GOLDEN_DIR, name)
    if os.environ.get("UPDATE_GOLDENS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        shutil.copy(src, golden)
        pytest.skip("golden regenerated — rerun to compare")
    if not osp_exists(golden):
        pytest.skip("no golden checked in")
    np.testing.assert_array_equal(
        np.load(src), np.load(golden),
        err_msg=f"golden drift in {name} (attack replay from an "
        "imported reference-TF checkpoint)",
    )
