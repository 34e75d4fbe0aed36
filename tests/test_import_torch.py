"""Reference torch transfer-AE checkpoint importers (train/import_torch.py).

Mapping tests are pure numpy (synthetic state dicts with the reference's
module names — reference: transfer/atlasnet/model/model_blocks.py:28-105,
model/atlasnet.py:43; transfer/foldingnet/foldingnet.py:57-189); forward
parity is checked against independent numpy forwards with the imported
weights; the round trips write real ``torch.save`` files in the reference's
two on-disk formats (DataParallel-prefixed flat state_dict /
``{'epoch','model',...}`` checkpoint dict) and restore through the actual
trainers.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes-scale; quick tier runs -m "not slow"

from geometric_adv_tpu.train.import_torch import (
    map_reference_atlasnet_state,
    map_reference_foldingnet_state,
)

BNECK = 16
HIDDEN = 8
NB_PRIM = 2
NUM_LAYERS = 2
N_IN = 12  # input cloud points


def _dense(rng, sd, base, c_in, c_out, conv=True):
    scale = np.float32(0.7 / np.sqrt(c_in))
    w = rng.randn(c_out, c_in).astype(np.float32) * scale
    sd[f"{base}.weight"] = w[:, :, None] if conv else w
    sd[f"{base}.bias"] = rng.randn(c_out).astype(np.float32) * 0.05


def _bn(rng, sd, base, c):
    sd[f"{base}.weight"] = 1 + rng.randn(c).astype(np.float32) * 0.05
    sd[f"{base}.bias"] = rng.randn(c).astype(np.float32) * 0.05
    sd[f"{base}.running_mean"] = rng.randn(c).astype(np.float32) * 0.05
    sd[f"{base}.running_var"] = 1 + rng.rand(c).astype(np.float32) * 0.2
    sd[f"{base}.num_batches_tracked"] = np.int64(1000)


def make_atlasnet_sd(seed=0, template_dim=3):
    rng = np.random.RandomState(seed)
    sd = {}
    for i, (ci, co) in enumerate([(3, 64), (64, 128), (128, BNECK)], 1):
        _dense(rng, sd, f"encoder.conv{i}", ci, co)
        _bn(rng, sd, f"encoder.bn{i}", co)
    for i in (1, 2):
        _dense(rng, sd, f"encoder.lin{i}", BNECK, BNECK, conv=False)
        _bn(rng, sd, f"encoder.bn{3 + i}", BNECK)
    for k in range(NB_PRIM):
        base = f"decoder.decoder.{k}"
        _dense(rng, sd, f"{base}.conv1", template_dim, BNECK)
        _bn(rng, sd, f"{base}.bn1", BNECK)
        _dense(rng, sd, f"{base}.conv2", BNECK, HIDDEN)
        _bn(rng, sd, f"{base}.bn2", HIDDEN)
        for i in range(NUM_LAYERS):
            _dense(rng, sd, f"{base}.conv_list.{i}", HIDDEN, HIDDEN)
            _bn(rng, sd, f"{base}.bn_list.{i}", HIDDEN)
        _dense(rng, sd, f"{base}.last_conv", HIDDEN, 3)
    return sd


def make_foldingnet_sd(seed=0):
    rng = np.random.RandomState(seed)
    sd = {}
    for i, (ci, co) in enumerate(
        [(12, 64), (64, 64), (64, 64), (64, 128), (128, 1024)], 1
    ):
        _dense(rng, sd, f"encoder.conv{i}", ci, co)
        _bn(rng, sd, f"encoder.bn{i}", co)
    _dense(rng, sd, "encoder.fc1", 1024, 512, conv=False)
    _bn(rng, sd, "encoder.bn6", 512)
    _dense(rng, sd, "encoder.fc2", 512, 512, conv=False)
    for ci, fold in ((514, 1), (515, 2)):
        _dense(rng, sd, f"decoder.fold{fold}.conv1", ci, 512)
        _dense(rng, sd, f"decoder.fold{fold}.conv2", 512, 512)
        _dense(rng, sd, f"decoder.fold{fold}.conv3", 512, 3)
    return sd


def _np_dense(sd, base, h, conv=True):
    w = sd[f"{base}.weight"]
    w = w[:, :, 0] if conv else w
    return h @ w.T + sd[f"{base}.bias"]


def _np_bn(sd, base, h):
    return (h - sd[f"{base}.running_mean"]) / np.sqrt(
        sd[f"{base}.running_var"] + 1e-5
    ) * sd[f"{base}.weight"] + sd[f"{base}.bias"]


def numpy_atlasnet_forward(sd, x, template):
    """Encoder + regular-template decode, straight numpy (inference BN)."""
    h = x
    for i in (1, 2):
        h = np.maximum(
            _np_bn(sd, f"encoder.bn{i}", _np_dense(sd, f"encoder.conv{i}", h)),
            0,
        )
    h = _np_bn(sd, "encoder.bn3", _np_dense(sd, "encoder.conv3", h))  # no relu
    h = h.max(axis=-2)
    for i in (1, 2):
        h = np.maximum(
            _np_bn(
                sd, f"encoder.bn{3 + i}",
                _np_dense(sd, f"encoder.lin{i}", h, conv=False),
            ),
            0,
        )
    latent = h
    outs = []
    for k in range(NB_PRIM):
        base = f"decoder.decoder.{k}"
        g = _np_dense(sd, f"{base}.conv1", template[k]) + latent[:, None, :]
        g = np.maximum(_np_bn(sd, f"{base}.bn1", g), 0)
        g = np.maximum(
            _np_bn(sd, f"{base}.bn2", _np_dense(sd, f"{base}.conv2", g)), 0
        )
        for i in range(NUM_LAYERS):
            g = np.maximum(
                _np_bn(
                    sd, f"{base}.bn_list.{i}",
                    _np_dense(sd, f"{base}.conv_list.{i}", g),
                ),
                0,
            )
        outs.append(_np_dense(sd, f"{base}.last_conv", g))
    return np.concatenate(outs, axis=-2), latent


def _atlasnet_trainer():
    from geometric_adv_tpu.transfer.trainers import AtlasNetTrainer

    return AtlasNetTrainer(
        number_points=10 * NB_PRIM, nb_primitives=NB_PRIM,
        n_points_input=N_IN,
    )


def _patched_init(orig):
    # shrink the module's widths to the synthetic dict's (the mapping code
    # itself is width-agnostic; the real widths would make these tests slow)
    def init(self, **kw):
        kw.setdefault("bottleneck_size", BNECK)
        kw.setdefault("hidden_neurons", HIDDEN)
        orig(self, **kw)
    return init


@pytest.fixture
def small_atlasnet(monkeypatch):
    from geometric_adv_tpu.models import atlasnet as atl

    orig = atl.AtlasNet.__init__
    monkeypatch.setattr(atl.AtlasNet, "__init__", _patched_init(orig))
    yield


def test_atlasnet_mapping_matches_model_tree(small_atlasnet):
    import jax

    sd = make_atlasnet_sd()
    params, stats, meta = map_reference_atlasnet_state(sd)
    assert meta == {
        "nb_primitives": NB_PRIM,
        "template_dim": 3,
        "bottleneck_size": BNECK,
        "hidden_neurons": HIDDEN,
        "num_layers": NUM_LAYERS,
    }

    trainer = _atlasnet_trainer()
    shapes = lambda t: jax.tree.map(lambda a: tuple(np.shape(a)), t)  # noqa: E731
    assert shapes(params) == shapes(jax.device_get(trainer.state.params))
    assert shapes(stats) == shapes(jax.device_get(trainer.state.batch_stats))
    # torch Conv1d [out, in, 1] -> Dense kernel is the squeezed transpose
    np.testing.assert_array_equal(
        params["encoder"]["conv2"]["kernel"],
        sd["encoder.conv2.weight"][:, :, 0].T,
    )
    np.testing.assert_array_equal(
        stats["decoder_1"]["bn2"]["var"],
        sd["decoder.decoder.1.bn2.running_var"],
    )


def test_atlasnet_forward_equals_numpy(small_atlasnet):
    sd = make_atlasnet_sd(seed=5)
    params, stats, _ = map_reference_atlasnet_state(sd)
    trainer = _atlasnet_trainer()
    trainer.state = trainer.state.replace(params=params, batch_stats=stats)

    x = np.random.RandomState(3).rand(4, N_IN, 3).astype(np.float32)
    recon = trainer.get_reconstructions(x)
    tpl = np.asarray(trainer._regular_template)
    want, _ = numpy_atlasnet_forward(sd, x, tpl)
    np.testing.assert_allclose(recon, want, rtol=1e-5, atol=1e-5)


def test_foldingnet_mapping_matches_model_tree():
    import jax

    from geometric_adv_tpu.transfer.trainers import FoldingNetTrainer

    sd = make_foldingnet_sd()
    params, stats = map_reference_foldingnet_state(sd)

    trainer = FoldingNetTrainer(n_points_input=32)
    shapes = lambda t: jax.tree.map(lambda a: tuple(np.shape(a)), t)  # noqa: E731
    assert shapes(params) == shapes(jax.device_get(trainer.state.params))
    assert shapes(stats) == shapes(jax.device_get(trainer.state.batch_stats))
    np.testing.assert_array_equal(
        params["decoder"]["fold2_conv1"]["kernel"],
        sd["decoder.fold2.conv1.weight"][:, :, 0].T,
    )
    np.testing.assert_array_equal(
        params["encoder"]["fc1"]["kernel"], sd["encoder.fc1.weight"].T
    )
    np.testing.assert_array_equal(
        stats["encoder"]["bn5"]["mean"], sd["encoder.bn5.running_mean"]
    )


def test_mapping_errors():
    with pytest.raises(ValueError, match="not a reference AtlasNet"):
        map_reference_atlasnet_state({"foo.weight": np.zeros((1,))})
    with pytest.raises(ValueError, match="not a reference FoldingNet"):
        map_reference_foldingnet_state({"foo.weight": np.zeros((1,))})
    sd = make_atlasnet_sd()
    sd["encoder.conv1.weight"] = np.zeros((64, 3, 2), np.float32)
    with pytest.raises(ValueError, match="filter size"):
        map_reference_atlasnet_state(sd)


def test_torch_roundtrip_atlasnet(small_atlasnet, tmp_path):
    torch = pytest.importorskip("torch")

    from geometric_adv_tpu.train.import_torch import (
        import_reference_atlasnet_checkpoint,
    )

    sd = make_atlasnet_sd(seed=9)
    # the on-disk format: DataParallel-prefixed flat state_dict
    torch.save(
        {f"module.{k}": torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        tmp_path / "network.pth",
    )
    train_dir = str(tmp_path / "imported")
    path, epoch, meta = import_reference_atlasnet_checkpoint(
        str(tmp_path / "network.pth"), train_dir, epoch=7
    )
    assert epoch == 7 and meta["nb_primitives"] == NB_PRIM

    trainer = _atlasnet_trainer()
    trainer.restore(train_dir, epoch=7)
    x = np.random.RandomState(1).rand(2, N_IN, 3).astype(np.float32)
    recon = trainer.get_reconstructions(x)
    want, _ = numpy_atlasnet_forward(
        sd, x, np.asarray(trainer._regular_template)
    )
    np.testing.assert_allclose(recon, want, rtol=1e-5, atol=1e-5)


def test_torch_roundtrip_foldingnet(tmp_path):
    torch = pytest.importorskip("torch")

    from geometric_adv_tpu.train.import_torch import (
        import_reference_foldingnet_checkpoint,
    )
    from geometric_adv_tpu.transfer.trainers import FoldingNetTrainer

    sd = make_foldingnet_sd(seed=13)
    # the on-disk format: {'epoch', 'model', 'optimizer'} checkpoint dict
    torch.save(
        {
            "epoch": 42,
            "model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
            "optimizer": {},
        },
        tmp_path / "checkpoint_42.pth",
    )
    train_dir = str(tmp_path / "imported")
    path, epoch = import_reference_foldingnet_checkpoint(
        str(tmp_path / "checkpoint_42.pth"), train_dir
    )
    assert epoch == 42

    trainer = FoldingNetTrainer(n_points_input=32)
    trainer.restore(train_dir, epoch=42)
    assert int(trainer.state.epoch) == 42
    x = np.random.RandomState(2).rand(2, 32, 3).astype(np.float32)
    recon = trainer.get_reconstructions(x)
    assert recon.shape == (2, 45 * 45, 3)
    assert np.isfinite(recon).all()
    # weights (not inits) are in play: two different imports disagree
    sd2 = make_foldingnet_sd(seed=14)
    torch.save(
        {"epoch": 1,
         "model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd2.items()}},
        tmp_path / "checkpoint_1.pth",
    )
    import_reference_foldingnet_checkpoint(
        str(tmp_path / "checkpoint_1.pth"), str(tmp_path / "imported2")
    )
    t2 = FoldingNetTrainer(n_points_input=32)
    t2.restore(str(tmp_path / "imported2"), epoch=1)
    assert np.abs(t2.get_reconstructions(x) - recon).max() > 1e-4


def test_torch_cli_branches(tmp_path, monkeypatch, capsys):
    torch = pytest.importorskip("torch")

    from geometric_adv_tpu.cli import import_reference_ckpt as cli

    sd = make_atlasnet_sd(seed=2)
    torch.save(
        {f"module.{k}": torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
        tmp_path / "network.pth",
    )
    monkeypatch.setattr(
        "sys.argv",
        ["x", "--model", "atlasnet",
         "--reference_ckpt", str(tmp_path / "network.pth"),
         "--project_dir", str(tmp_path),
         "--train_folder", "log/atlasnet_for_transfer"],
    )
    cli.main()
    out = capsys.readouterr().out
    assert "imported atlasnet epoch 0" in out
    assert "--transfer_ae_restore_epoch 0" in out

    sd2 = make_foldingnet_sd(seed=3)
    torch.save(
        {"epoch": 9,
         "model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd2.items()}},
        tmp_path / "checkpoint_9.pth",
    )
    monkeypatch.setattr(
        "sys.argv",
        ["x", "--model", "foldingnet",
         "--reference_ckpt", str(tmp_path / "checkpoint_9.pth"),
         "--project_dir", str(tmp_path),
         "--train_folder", "log/foldingnet_for_transfer"],
    )
    cli.main()
    out = capsys.readouterr().out
    assert "imported foldingnet epoch 9" in out
