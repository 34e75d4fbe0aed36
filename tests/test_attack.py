"""Attack core: scan parity vs an explicit reference-style loop, plus
pipeline helpers and the pairwise chamfer matrix job."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geometric_adv_tpu.attack.core import (
    AttackRunner,
    attack_batch,
    init_pert,
    make_attack_loss,
    _tf_adam_update,
)
from geometric_adv_tpu.attack.pipeline import (
    get_rand_idx,
    latent_dist_matrix,
    prepare_data_for_attack,
    sort_dist_mat,
)
from geometric_adv_tpu.models import PointNetAE
from geometric_adv_tpu.ops.pairwise import chamfer_distance_matrix
from geometric_adv_tpu.parallel import get_mesh
from geometric_adv_tpu.train import AETrainer, Configuration


def tiny_model(n=32, bneck=8, seed=0):
    model = PointNetAE(
        n_points=n, bneck_size=bneck, encoder_filters=[16, bneck],
        decoder_sizes=[16, 16],
    )
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, n, 3)), train=False
    )
    encode = lambda x: model.apply(  # noqa: E731
        variables, x, train=False, method=PointNetAE.encode
    )
    decode = lambda z: model.apply(  # noqa: E731
        variables, z, train=False, method=PointNetAE.decode
    )
    return model, variables, encode, decode


def reference_attack_loop(
    encode, decode, x, target_z, gt, loss_ref, dist_weight,
    num_iterations, thresh, lr,
):
    """Literal transcription of the reference's per-iteration session loop
    (reference: src/adv_ae.py:209-246): update pert, read post-update
    metrics, record best from iteration >= thresh by strict <."""
    forward = make_attack_loss(
        encode, decode, "chamfer", "chamfer", "chamfer", 0.0, 0.0
    )
    b, n, _ = x.shape
    pert = init_pert((b, n, 3))
    m = jnp.zeros_like(pert)
    v = jnp.zeros_like(pert)
    best_tre = np.full(b, 1e10, np.float32)
    best_metrics = np.zeros((b, 4), np.float32)
    best_adv = np.zeros_like(np.asarray(x))
    best_recon = None
    grad_fn = jax.jit(jax.value_and_grad(forward, has_aux=True))
    for iteration in range(num_iterations):
        (_, _), g = grad_fn(pert, x, target_z, gt, dist_weight)
        step, m, v = _tf_adam_update(
            g, m, v, jnp.float32(iteration + 1), lr
        )
        pert = pert - step
        (_, aux), _ = grad_fn(pert, x, target_z, gt, dist_weight)
        if iteration + 1 >= thresh:
            tre = np.asarray(aux["t_re"])
            for j in range(b):
                if tre[j] < best_tre[j]:
                    best_tre[j] = tre[j]
                    best_metrics[j] = [
                        np.asarray(aux["loss_adv"])[j],
                        np.asarray(aux["loss_dist"])[j],
                        np.asarray(aux["source_chamfer"])[j],
                        tre[j] / loss_ref[j],
                    ]
                    best_adv[j] = np.asarray(aux["adv"])[j]
                    if best_recon is None:
                        best_recon = np.zeros(
                            (b,) + np.asarray(aux["recon"]).shape[1:],
                            np.float32,
                        )
                    best_recon[j] = np.asarray(aux["recon"])[j]
    return (
        np.concatenate([best_metrics, best_tre[:, None]], -1),
        best_adv,
        best_recon,
    )


def test_scan_attack_matches_reference_loop(rng):
    """The single-scan attack must reproduce the reference's loop semantics
    (post-update metric reads, >= thresh recording window, strict-< best)."""
    _, _, encode, decode = tiny_model()
    b, n = 3, 32
    x = rng.rand(b, n, 3).astype(np.float32)
    gt = rng.rand(b, n, 3).astype(np.float32)
    target_z = np.asarray(encode(gt))
    loss_ref = rng.rand(b).astype(np.float32) + 0.5

    num_iter, thresh, lr = 20, 12, 0.01
    ref_metrics, ref_adv, ref_recon = reference_attack_loop(
        encode, decode, x, target_z, gt, loss_ref, 1.0, num_iter, thresh, lr
    )
    out = attack_batch(
        encode, decode, x, target_z, gt, loss_ref,
        np.array([1.0], np.float32),
        num_iterations=num_iter, num_iterations_thresh=thresh,
        learning_rate=lr,
    )
    np.testing.assert_allclose(out.metrics[0], ref_metrics, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(out.pc_input[0], ref_adv, atol=1e-5)
    np.testing.assert_allclose(out.pc_recon[0], ref_recon, atol=1e-5)


def test_attack_reduces_target_recon_error(rng):
    """After optimization the adv input must reconstruct closer to the
    target than the clean source does (the attack's raison d'etre)."""
    _, _, encode, decode = tiny_model()
    b, n = 4, 32
    x = rng.rand(b, n, 3).astype(np.float32)
    gt = np.roll(x, 1, axis=0) + 0.3
    target_z = np.asarray(encode(gt))
    loss_ref = np.ones(b, np.float32)

    from geometric_adv_tpu.ops import chamfer_loss_per_pc

    clean_tre = np.asarray(chamfer_loss_per_pc(np.asarray(decode(encode(x))), gt))
    out = attack_batch(
        encode, decode, x, target_z, gt, loss_ref,
        np.array([0.1], np.float32),
        num_iterations=150, num_iterations_thresh=100, learning_rate=0.02,
    )
    best_tre = np.asarray(out.metrics[0, :, 4])
    assert np.all(best_tre < clean_tre), (best_tre, clean_tre)


def test_latent_attack_variant(rng):
    _, _, encode, decode = tiny_model()
    b, n = 2, 32
    x = rng.rand(b, n, 3).astype(np.float32)
    gt = rng.rand(b, n, 3).astype(np.float32) + 0.5
    target_z = np.asarray(encode(gt))
    out = attack_batch(
        encode, decode, x, target_z, gt, np.ones(b, np.float32),
        np.array([1.0], np.float32),
        num_iterations=100, num_iterations_thresh=50, learning_rate=0.02,
        loss_adv_type="latent", loss_dist_type="pert",
    )
    # latent loss_adv column must be the z-space distance, decreasing
    z_final = np.asarray(encode(out.pc_input[0]))
    d_final = np.linalg.norm(z_final - target_z, axis=1)
    d_init = np.linalg.norm(np.asarray(encode(x)) - target_z, axis=1)
    assert np.all(d_final < d_init)


def test_multi_weight_vmap_matches_sequential(rng):
    _, _, encode, decode = tiny_model()
    b, n = 2, 32
    x = rng.rand(b, n, 3).astype(np.float32)
    gt = rng.rand(b, n, 3).astype(np.float32)
    target_z = np.asarray(encode(gt))
    ref = np.ones(b, np.float32)
    kw = dict(num_iterations=15, num_iterations_thresh=10, learning_rate=0.01)

    both = attack_batch(
        encode, decode, x, target_z, gt, ref,
        np.array([0.5, 2.0], np.float32), **kw
    )
    for wi, w in enumerate([0.5, 2.0]):
        single = attack_batch(
            encode, decode, x, target_z, gt, ref,
            np.array([w], np.float32), **kw
        )
        np.testing.assert_allclose(
            both.metrics[wi], single.metrics[0], rtol=1e-5, atol=1e-7
        )


def test_attack_runner_sharded_matches_single(rng, tmp_path):
    """AttackRunner over the 8-device mesh == single device, bitwise-ish."""
    n = 32
    conf = Configuration(
        n_input=[n, 3], bneck_size=8, encoder_filters=[16, 8],
        decoder_sizes=[16, 16], batch_size=8, num_iterations=10,
        num_iterations_thresh=5, learning_rate=0.01,
        dist_weight_list=[1.0], train_dir=str(tmp_path),
    )
    trainer = AETrainer(conf)
    b = 16
    x = rng.rand(b, n, 3).astype(np.float32)
    gt = rng.rand(b, n, 3).astype(np.float32)
    tz = trainer.get_latent_vectors(gt)
    ref = np.ones(b, np.float32)

    single = AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats, conf
    ).attack(x, tz, gt, ref)
    sharded = AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats, conf,
        mesh=get_mesh(),
    ).attack(x, tz, gt, ref)
    np.testing.assert_allclose(
        single.metrics, sharded.metrics, rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(single.pc_input, sharded.pc_input, atol=1e-5)


# ---------------- pipeline helpers ----------------
def test_prepare_data_for_attack_semantics(rng):
    """3 classes x 4 instances; select 2 sources/class, 2 targets/pair."""
    n_cls, per_cls, n_pts = 3, 4, 8
    slice_idx = [0, 4, 8, 12]
    pc_classes = np.array(["a", "b", "c"])
    data = rng.rand(12, n_pts, 3).astype(np.float32)
    attack_pc_idx = np.tile(np.array([[0, 2]]), (n_cls, 1))
    # nn_idx rows: source-local x target-local ascending identity
    nn_idx = np.tile(np.arange(per_cls, dtype=np.int16), (12, 3))
    nn_idx = nn_idx.reshape(12, 12)

    src, tgt = prepare_data_for_attack(
        pc_classes, ["a"], list(pc_classes), data, slice_idx,
        attack_pc_idx, 2, nn_idx, None,
    )
    # 2 sources x (2 target classes x 2 targets) = 8 rows
    assert src.shape == (8, n_pts, 3)
    assert tgt.shape == (8, n_pts, 3)
    np.testing.assert_array_equal(src[0], data[0])
    np.testing.assert_array_equal(src[4], data[2])
    np.testing.assert_array_equal(tgt[0], data[4])  # class b, local idx 0
    np.testing.assert_array_equal(tgt[1], data[5])  # class b, local idx 1
    np.testing.assert_array_equal(tgt[2], data[8])  # class c, local idx 0


def test_get_rand_idx_deterministic():
    slice_idx = [0, 50, 120]
    a = get_rand_idx(slice_idx, 10)
    b = get_rand_idx(slice_idx, 10)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 10)
    assert a.min() >= 0
    # per-class local indices stay in range
    assert a[0].max() < 50 and a[1].max() < 70


def test_sort_dist_mat_blocks(rng):
    slice_idx = [0, 3, 7]
    d = rng.rand(7, 7).astype(np.float32)
    nn = sort_dist_mat(d, slice_idx)
    blk = d[0:3, 3:7]
    np.testing.assert_array_equal(nn[0:3, 3:7], np.argsort(blk, axis=1))
    assert nn.dtype == np.int16


def test_chamfer_distance_matrix(rng):
    pcs = rng.rand(9, 24, 3).astype(np.float32)
    mat = chamfer_distance_matrix(pcs, pair_block=16)
    # brute force
    from geometric_adv_tpu.ops import chamfer_loss_per_pc

    for i in range(9):
        for j in range(9):
            ref = float(
                chamfer_loss_per_pc(pcs[i : i + 1], pcs[j : j + 1])[0]
            )
            np.testing.assert_allclose(mat[i, j], ref, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(mat, mat.T, atol=0)
    np.testing.assert_allclose(np.diag(mat), 0.0, atol=1e-7)

    # multi-chunk path: 45 pairs over 8-pair blocks, 2 blocks per chunk ->
    # 3 chunks with a padded tail; must equal the single-chunk result
    mat2 = chamfer_distance_matrix(pcs, pair_block=8, blocks_per_chunk=2)
    np.testing.assert_allclose(mat2, mat, atol=0)

    # an already-device-resident cloud set (how a pipeline stage that keeps
    # its dataset on device calls it) must produce the identical matrix
    mat3 = chamfer_distance_matrix(jax.device_put(pcs), pair_block=16)
    np.testing.assert_allclose(mat3, mat, atol=0)


def test_chamfer_distance_matrix_sharded(rng):
    pcs = rng.rand(10, 16, 3).astype(np.float32)
    single = chamfer_distance_matrix(pcs, pair_block=8)
    sharded = chamfer_distance_matrix(pcs, pair_block=24, mesh=get_mesh())
    np.testing.assert_allclose(single, sharded, atol=1e-6)


def _surface_clouds(n_per=6, m=256):
    """Small surface-like cloud set (the screen's intended geometry)."""
    from geometric_adv_tpu.data.synthetic import sample_shape

    pcs, slice_idx = [], [0]
    for c in ("sphere", "cube", "torus"):
        for i in range(n_per):
            pcs.append(
                np.asarray(sample_shape(c, m, np.random.RandomState(i + 7)))
            )
        slice_idx.append(len(pcs))
    return np.stack(pcs).astype(np.float32), np.array(slice_idx)


def test_chamfer_matrix_screened_full_coverage_is_exact():
    """screen_k == screen_chunks scans every chunk — the candidate set is
    the whole cloud, so the screened matrix must EQUAL the exact one
    bit-for-bit modulo summation order (also exercises the Morton sort,
    gather, and non-divisible-m padding paths structurally)."""
    pcs, _ = _surface_clouds(n_per=3, m=60)  # 60 % 8 != 0 -> padded chunks
    exact = chamfer_distance_matrix(pcs, pair_block=16, method="direct")
    scr = chamfer_distance_matrix(
        pcs, pair_block=16, screen_chunks=8, screen_k=8
    )
    np.testing.assert_allclose(scr, exact, rtol=1e-6, atol=1e-7)


def test_chamfer_matrix_screened_majorizes_and_orders():
    """Partial screen: entries majorize the exact values and the per
    class-block neighbor orderings (the matrix job's consumer,
    sort_dist_mat) keep their heads."""
    pcs, slice_idx = _surface_clouds(n_per=6, m=256)
    exact = chamfer_distance_matrix(pcs, pair_block=32, method="direct")
    scr = chamfer_distance_matrix(
        pcs, pair_block=32, screen_chunks=16, screen_k=6
    )
    assert np.all(scr >= exact - 1e-6)
    off = ~np.eye(len(pcs), dtype=bool)
    rel = np.abs(scr - exact)[off] / np.maximum(exact[off], 1e-12)
    assert rel.mean() < 0.02, f"mean rel err {rel.mean():.3f}"

    nn_e = sort_dist_mat(exact.copy(), slice_idx)
    nn_s = sort_dist_mat(scr.copy(), slice_idx)
    hits = total = 0
    for i in range(len(pcs)):
        for j in range(len(slice_idx) - 1):
            a = set(nn_e[i, slice_idx[j]:slice_idx[j + 1]][:3].tolist())
            b = set(nn_s[i, slice_idx[j]:slice_idx[j + 1]][:3].tolist())
            hits += len(a & b)
            total += 3
    assert hits / total > 0.9, f"top-3 overlap {hits}/{total}"


def test_chamfer_matrix_screened_sharded(rng):
    pcs, _ = _surface_clouds(n_per=4, m=64)
    single = chamfer_distance_matrix(
        pcs, pair_block=8, screen_chunks=8, screen_k=3
    )
    sharded = chamfer_distance_matrix(
        pcs, pair_block=24, screen_chunks=8, screen_k=3, mesh=get_mesh()
    )
    np.testing.assert_allclose(single, sharded, atol=1e-6)


def test_latent_dist_matrix(rng):
    z = rng.rand(6, 4).astype(np.float32)
    m = latent_dist_matrix(z)
    np.testing.assert_allclose(
        m[1, 3], np.linalg.norm(z[1] - z[3]), rtol=1e-6
    )
    np.testing.assert_allclose(m, m.T, atol=0)


def test_binary_search_attack(rng):
    """Binary-search dist-weight variant
    (reference: src/adv_ae.py:253-304)."""
    from geometric_adv_tpu.attack.core import binary_search_attack

    _, _, encode, decode = tiny_model()
    b, n = 3, 32
    x = rng.rand(b, n, 3).astype(np.float32)
    gt = rng.rand(b, n, 3).astype(np.float32) + 0.3
    tz = np.asarray(encode(gt))

    best_adv, best_dist, best_attack, weights = binary_search_attack(
        encode, decode, x, tz, gt,
        init_dist_weight=5.0, upper_bound_dist_weight=50.0,
        binary_search_step=4, num_iterations=20, learning_rate=0.02,
    )
    assert best_attack.shape == (b, n, 3)
    assert np.all(np.isfinite(best_dist)) and np.all(best_dist < 1e10)
    assert np.all(weights >= 0) and np.all(weights <= 50.0)
    # bisection moved the weights off the initial value
    assert not np.allclose(weights, 5.0)


def test_emd_attack_variant(rng):
    """EMD-victim attack path: t_re and input-dist use the fused EMD cost
    (repaired semantics — the reference's EMD branch is non-functional,
    SURVEY §2.2)."""
    _, _, encode, decode = tiny_model()
    b, n = 2, 32
    x = rng.rand(b, n, 3).astype(np.float32)
    gt = rng.rand(b, n, 3).astype(np.float32) + 0.3
    tz = np.asarray(encode(gt))
    out = attack_batch(
        encode, decode, x, tz, gt, np.ones(b, np.float32),
        np.array([0.5], np.float32),
        num_iterations=40, num_iterations_thresh=20, learning_rate=0.02,
        ae_loss_type="emd",
    )
    m = np.asarray(out.metrics[0])
    assert np.all(np.isfinite(m))
    # T-RE column is an EMD cost: scales with n (sum over points), not a mean
    from geometric_adv_tpu.ops.emd import emd_loss_fused

    tre_now = np.asarray(emd_loss_fused(
        np.asarray(decode(encode(out.pc_input[0]))), gt))
    assert np.all(m[:, 4] <= tre_now + 1e-3)  # best <= final


def test_chamfer_impl_calibration_machinery(rng, monkeypatch):
    """The on-chip fused/composed calibration (attack/core.py): measures
    both arms, returns a bool, caches the decision per shape/config, and
    never runs from AttackRunner on CPU (routing there is composed anyway).
    The decision's on-TPU behavior is pinned by cli/verify_tpu.py check 7."""
    import geometric_adv_tpu.attack.core as core

    _, _, encode, decode = tiny_model()
    monkeypatch.setattr(core, "_CALIB_BATCH", 2)
    monkeypatch.setattr(core, "_CALIB_ITERS", 2)
    monkeypatch.setattr(core, "_CALIB_REPS", 1)
    core._CHAMFER_CALIB_CACHE.clear()

    conf = Configuration(
        n_input=[32, 3], bneck_size=8, batch_size=2, learning_rate=0.01,
        dist_weight_list=[1.0], num_iterations=5, num_iterations_thresh=1,
        saver_step=None,
    )
    decision = core._calibrate_chamfer_impl(encode, decode, conf)
    assert isinstance(decision, bool)
    assert len(core._CHAMFER_CALIB_CACHE) == 1

    # cache hit: poison the cached value and confirm no re-measurement
    key = next(iter(core._CHAMFER_CALIB_CACHE))
    core._CHAMFER_CALIB_CACHE[key] = not decision
    assert core._calibrate_chamfer_impl(encode, decode, conf) == (not decision)
    core._CHAMFER_CALIB_CACHE.clear()


def test_attack_runner_skips_calibration_on_cpu(rng, tmp_path):
    """On CPU the runner must not calibrate (the fused kernel is TPU-only;
    CPU golden artifacts keep the composed path's bits)."""
    import geometric_adv_tpu.attack.core as core

    core._CHAMFER_CALIB_CACHE.clear()
    conf = Configuration(
        n_input=[32, 3], bneck_size=8, batch_size=2, learning_rate=0.01,
        dist_weight_list=[1.0], num_iterations=5, num_iterations_thresh=1,
        saver_step=None,
    )
    trainer = AETrainer(conf)
    runner = AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats, conf
    )
    assert len(core._CHAMFER_CALIB_CACHE) == 0
    assert runner.chamfer_method == "auto"


def test_calibration_cache_keys_victim_identity(rng, monkeypatch):
    """The fused/composed decision is made against a specific victim's
    scheduling (the gap lives in the encoder backward), so two different
    victim signatures must each get their own measurement."""
    import geometric_adv_tpu.attack.core as core

    _, _, encode, decode = tiny_model()
    monkeypatch.setattr(core, "_CALIB_BATCH", 2)
    monkeypatch.setattr(core, "_CALIB_ITERS", 2)
    monkeypatch.setattr(core, "_CALIB_REPS", 1)
    core._CHAMFER_CALIB_CACHE.clear()
    conf = Configuration(
        n_input=[32, 3], bneck_size=8, batch_size=2, learning_rate=0.01,
        dist_weight_list=[1.0], num_iterations=5, num_iterations_thresh=1,
        saver_step=None,
    )
    core._calibrate_chamfer_impl(encode, decode, conf, victim_sig=("a",))
    core._calibrate_chamfer_impl(encode, decode, conf, victim_sig=("b",))
    assert len(core._CHAMFER_CALIB_CACHE) == 2
    core._CHAMFER_CALIB_CACHE.clear()


def test_attack_runner_binds_explicit_chamfer_impl(rng):
    """chamfer_impl='fused'/'composed' binds the routing to THIS runner
    (no calibration, no process globals): two runners in one process keep
    independent decisions, and on CPU both trace to the same composed
    program (the fused kernel is TPU-only, so 'fused' falls back) —
    metrics must agree bit-for-bit."""
    import geometric_adv_tpu.attack.core as core
    import geometric_adv_tpu.ops.chamfer as chamfer_mod

    core._CHAMFER_CALIB_CACHE.clear()
    conf = Configuration(
        n_input=[32, 3], bneck_size=8, batch_size=2, learning_rate=0.01,
        dist_weight_list=[1.0], num_iterations=4, num_iterations_thresh=1,
        saver_step=None,
    )
    trainer = AETrainer(conf)
    prev_global = chamfer_mod.FUSED_LOSS_ENABLED
    runners = {
        impl: AttackRunner(
            trainer.model, trainer.state.params, trainer.state.batch_stats,
            conf, chamfer_impl=impl,
        )
        for impl in ("fused", "composed")
    }
    assert chamfer_mod.FUSED_LOSS_ENABLED == prev_global  # globals untouched
    assert len(core._CHAMFER_CALIB_CACHE) == 0  # forcing skips calibration
    assert runners["fused"].chamfer_method == "fused"
    assert runners["composed"].chamfer_method == "composed"

    x = (rng.rand(2, 32, 3).astype(np.float32) - 0.5)
    gt = (rng.rand(2, 32, 3).astype(np.float32) - 0.5)
    outs = {
        impl: r.attack(
            x, np.zeros((2, 8), np.float32), gt, np.ones(2, np.float32)
        )
        for impl, r in runners.items()
    }
    np.testing.assert_array_equal(
        np.asarray(outs["fused"].metrics), np.asarray(outs["composed"].metrics)
    )


def test_chamfer_loss_per_pc_explicit_methods(rng):
    """method='fused' and method='composed' agree with 'auto' on CPU
    (all three are the composed path off-TPU)."""
    from geometric_adv_tpu.ops import chamfer_loss_per_pc

    a = jnp.asarray(rng.rand(3, 24, 3).astype(np.float32))
    b2 = jnp.asarray(rng.rand(3, 20, 3).astype(np.float32))
    base = np.asarray(chamfer_loss_per_pc(a, b2))
    for method in ("fused", "composed"):
        np.testing.assert_array_equal(
            np.asarray(chamfer_loss_per_pc(a, b2, method=method)), base
        )


# ---------------------------------------------------------------------------
# frozen-assignment chamfer fast mode (chamfer_refresh; PARITY #13)


def test_frozen_payloads_match_exact_at_refresh(rng):
    """The frozen-form chamfer loss and gradient, evaluated at the same
    clouds the payloads were computed from (delta == 0), must equal the
    exact chamfer_loss_per_pc value and gradient."""
    from geometric_adv_tpu.attack.core import _frozen_chamfer_terms
    from geometric_adv_tpu.ops import chamfer_loss_per_pc
    from geometric_adv_tpu.ops.chamfer import chamfer_frozen_payloads

    b, n, m = 3, 40, 24
    x1 = jnp.asarray(rng.rand(b, n, 3).astype(np.float32) - 0.5)
    x2 = jnp.asarray(rng.rand(b, m, 3).astype(np.float32) - 0.5)

    d1, d2, nn1, snn1, cnt1 = chamfer_frozen_payloads(x1, x2)
    payload = {
        "nn1": nn1,
        "r": snn1 - cnt1[..., None] * x1,
        "cnt": cnt1,
        "d2sum0": jnp.sum(d2, axis=-1),
        "x1_0": x1,
    }

    def frozen_loss(z):
        d1f, mean_d2 = _frozen_chamfer_terms(z, payload, m)
        return jnp.mean(d1f, axis=-1) + mean_d2

    def exact_loss(z):
        return chamfer_loss_per_pc(z, x2)

    np.testing.assert_allclose(
        np.asarray(frozen_loss(x1)), np.asarray(exact_loss(x1)),
        rtol=1e-6, atol=1e-7,
    )
    g_frozen = jax.grad(lambda z: jnp.sum(frozen_loss(z)))(x1)
    g_exact = jax.grad(lambda z: jnp.sum(exact_loss(z)))(x1)
    np.testing.assert_allclose(
        np.asarray(g_frozen), np.asarray(g_exact), rtol=1e-5, atol=1e-7
    )


def test_frozen_payloads_cpu_fallback_semantics(rng):
    """The composed-fallback payloads (scatter sums/counts) match a numpy
    loop over the exact NN indices."""
    from geometric_adv_tpu.ops.chamfer import (
        chamfer_frozen_payloads,
        nn_distance,
    )

    b, n, m = 2, 17, 23
    x1 = rng.rand(b, n, 3).astype(np.float32)
    x2 = rng.rand(b, m, 3).astype(np.float32)
    d1, d2, nn1, snn1, cnt1 = chamfer_frozen_payloads(
        jnp.asarray(x1), jnp.asarray(x2)
    )
    d1_ref, i1_ref, d2_ref, i2_ref = (
        np.asarray(a) for a in nn_distance(x1, x2)
    )
    np.testing.assert_array_equal(np.asarray(d1), d1_ref)
    np.testing.assert_array_equal(np.asarray(d2), d2_ref)
    for bi in range(b):
        np.testing.assert_array_equal(
            np.asarray(nn1)[bi], x2[bi][i1_ref[bi]]
        )
        snn_ref = np.zeros((n, 3), np.float32)
        cnt_ref = np.zeros((n,), np.float32)
        for j in range(m):
            snn_ref[i2_ref[bi, j]] += x2[bi, j]
            cnt_ref[i2_ref[bi, j]] += 1.0
        np.testing.assert_allclose(
            np.asarray(snn1)[bi], snn_ref, rtol=1e-6, atol=1e-7
        )
        np.testing.assert_array_equal(np.asarray(cnt1)[bi], cnt_ref)


def test_frozen_attack_refresh_1_matches_exact(rng):
    """chamfer_refresh=1 recomputes assignments every step, so the fast
    mode must reproduce the exact attack trajectory (within f32
    association of the loss forms)."""
    _, _, encode, decode = tiny_model()
    b, n = 3, 32
    x = rng.rand(b, n, 3).astype(np.float32)
    gt = rng.rand(b, n, 3).astype(np.float32)
    target_z = np.asarray(encode(gt))
    loss_ref = rng.rand(b).astype(np.float32) + 0.5
    kwargs = dict(
        num_iterations=20, num_iterations_thresh=12, learning_rate=0.01,
    )
    exact = attack_batch(
        encode, decode, x, target_z, gt, loss_ref,
        np.array([1.0], np.float32), **kwargs,
    )
    frozen = attack_batch(
        encode, decode, x, target_z, gt, loss_ref,
        np.array([1.0], np.float32), chamfer_refresh=1, **kwargs,
    )
    np.testing.assert_allclose(
        np.asarray(frozen.metrics), np.asarray(exact.metrics),
        rtol=2e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(frozen.pc_input), np.asarray(exact.pc_input), atol=1e-5
    )


def test_frozen_attack_period_close_to_exact(rng):
    """A realistic refresh period stays within a small tolerance of the
    exact trajectory (documented deviation, PARITY #13), including when
    the period does not divide the step count (remainder chunk)."""
    _, _, encode, decode = tiny_model()
    b, n = 3, 32
    x = rng.rand(b, n, 3).astype(np.float32)
    gt = rng.rand(b, n, 3).astype(np.float32)
    target_z = np.asarray(encode(gt))
    loss_ref = np.ones(b, np.float32)
    kwargs = dict(
        num_iterations=30, num_iterations_thresh=15, learning_rate=0.01,
    )
    exact = attack_batch(
        encode, decode, x, target_z, gt, loss_ref,
        np.array([1.0], np.float32), **kwargs,
    )
    frozen = attack_batch(
        encode, decode, x, target_z, gt, loss_ref,
        np.array([1.0], np.float32), chamfer_refresh=8, **kwargs,
    )
    # 31 steps = 3 full chunks of 8 + remainder 7.
    # Tolerances are loose by design: with a toy random AE the frozen
    # metric values can flip WHICH iteration wins the strict-< best
    # selection (the clouds differ then by a few optimizer steps). The
    # exact-equivalence check is test_frozen_attack_refresh_1_matches_exact;
    # real-victim deviation is validated at FULLRUN scale (PARITY #13).
    np.testing.assert_allclose(
        np.asarray(frozen.metrics), np.asarray(exact.metrics),
        rtol=0.1, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(frozen.pc_input), np.asarray(exact.pc_input), atol=0.05
    )
    # and the fast mode still attacks: best T-RE improves on the initial
    assert np.all(np.asarray(frozen.metrics)[0, :, 4] < 1e10)


def test_frozen_attack_rejects_emd_loss(rng):
    _, _, encode, decode = tiny_model()
    x = rng.rand(2, 32, 3).astype(np.float32)
    with pytest.raises(ValueError, match="chamfer"):
        attack_batch(
            encode, decode, x, np.zeros((2, 8), np.float32), x,
            np.ones(2, np.float32), np.array([1.0], np.float32),
            num_iterations=2, num_iterations_thresh=1,
            ae_loss_type="emd", chamfer_refresh=4,
        )


def test_attack_runner_frozen_mode(rng):
    """conf.chamfer_refresh > 0 routes the runner to the frozen program:
    no calibration, attack_mode records the period, outputs stay close to
    the exact runner's."""
    import geometric_adv_tpu.attack.core as core

    core._CHAMFER_CALIB_CACHE.clear()
    conf = Configuration(
        n_input=[32, 3], bneck_size=8, batch_size=4, learning_rate=0.01,
        dist_weight_list=[1.0], num_iterations=10, num_iterations_thresh=2,
        saver_step=None, chamfer_refresh=4,
    )
    trainer = AETrainer(conf)
    runner = AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats, conf,
    )
    assert runner.attack_mode == "frozen-4"
    assert len(core._CHAMFER_CALIB_CACHE) == 0

    conf_exact = conf.copy()
    conf_exact.chamfer_refresh = 0
    exact_runner = AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats,
        conf_exact,
    )
    assert exact_runner.attack_mode in ("auto", "fused", "composed")

    x = rng.rand(4, 32, 3).astype(np.float32) - 0.5
    gt = rng.rand(4, 32, 3).astype(np.float32) - 0.5
    tz = np.zeros((4, 8), np.float32)
    ref = np.ones(4, np.float32)
    out_f = runner.attack(x, tz, gt, ref)
    out_e = exact_runner.attack(x, tz, gt, ref)
    np.testing.assert_allclose(
        np.asarray(out_f.metrics), np.asarray(out_e.metrics),
        rtol=0.05, atol=1e-4,
    )
