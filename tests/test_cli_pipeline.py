"""End-to-end CLI pipeline smoke test at tiny scale.

Runs the actual stage CLIs as subprocesses (like a user would) against a
tiny synthetic dataset and checks the artifact contract between stages —
then diffs every stage's (small) numeric artifacts bit-wise against the
checked-in goldens under tests/golden/ (regenerate with
UPDATE_GOLDENS=1 python -m pytest tests/test_cli_pipeline.py).

The whole pipeline is deterministic on a fixed platform: every stage seeds
its PRNGs (data seed 42/55, init seeds, jax dropout keys), so any golden
drift is a real numeric regression (SURVEY §4: the reference's sanity bars
encode exactly this kind of cross-stage replay parity).
"""

import os
import os.path as osp
import shutil
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # minutes-scale; quick tier runs -m "not slow"

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
GOLDEN_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "golden")


def run_cli(module, *args, cwd=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    result = subprocess.run(
        [sys.executable, "-m", f"geometric_adv_tpu.cli.{module}", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=600,
    )
    assert result.returncode == 0, (
        f"{module} failed:\nSTDOUT:\n{result.stdout[-3000:]}\n"
        f"STDERR:\n{result.stderr[-3000:]}"
    )
    return result.stdout


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("pipeline"))


def test_full_pipeline(pipeline_dir):
    d = pipeline_dir
    ae = "log/autoencoder_victim"
    sel = f"{ae}/eval/sel_idx_rand_4_test_set_13l.npy"
    common = ["--project_dir", d]

    # 40/class -> 34/2/4 train/val/test split: enough test examples for
    # 2 sources x 2 NN targets per class
    run_cli("make_synthetic_data", *common, "--data_folder", "data/tiny",
            "--class_names", "sphere", "cube", "torus",
            "--n_per_class", "40", "--n_points", "64")

    run_cli("train_ae", *common, "--data_folder", "data/tiny",
            "--n_points", "64", "--bneck_size", "16", "--batch_size", "10",
            "--training_epochs", "3", "--train_folder", ae)
    assert osp.exists(osp.join(d, ae, "configuration.json"))
    assert osp.exists(osp.join(d, ae, "train_stats.txt"))

    run_cli("tst_ae", *common, "--data_folder", "data/tiny",
            "--train_folder", ae)
    eval_dir = osp.join(d, ae, "eval")
    for base in ("point_clouds_test_set_13l.npy",
                 "latent_vectors_test_set_13l.npy",
                 "reconstructions_test_set_13l.npy",
                 "ae_loss_test_set_13l.npy", "slice_idx_test_set_13l.npy",
                 "pc_classes_13l.npy", "pc_label_test_set_13l.npy"):
        assert osp.exists(osp.join(eval_dir, base)), base

    run_cli("prepare_indices_for_attack", *common, "--ae_folder", ae,
            "--get_rand_idx", "1", "--get_latent_nn_idx", "1",
            "--get_chamfer_nn_idx", "1", "--num_instance_per_class", "4")
    assert osp.exists(osp.join(eval_dir, "chamfer_nn_idx_complete_test_set_13l.npy"))

    run_cli("run_attack", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel, "--num_pc_for_attack", "2",
            "--num_pc_for_target", "2", "--num_iterations", "5",
            "--num_iterations_thresh", "3", "--use_mesh", "0")
    attack_dir = osp.join(eval_dir, "attack_res")
    m = np.load(osp.join(attack_dir, "sphere", "adversarial_metrics.npy"))
    assert m.shape == (1, 8, 5)  # 2 sources x 2 target classes x 2 targets

    run_cli("get_dists_per_point", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel)
    run_cli("evaluate_attack", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel)
    assert osp.exists(
        osp.join(attack_dir, "sphere", "analysis_results",
                 "source_target_norm_min_idx.npy")
    )
    stats = open(
        osp.join(attack_dir, "over_classes", "eval_stats.txt")
    ).read()
    assert "S-CD" in stats and "over classes" in stats

    run_cli("run_defense_critical", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel)
    dm = np.load(
        osp.join(attack_dir, "defense_critical_res", "sphere",
                 "defense_metrics.npy")
    )
    assert dm.shape == (1, 8, 4)
    run_cli("evaluate_defense", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel, "--defense_folder",
            "defense_critical_res")

    run_cli("get_knn_dists_per_point", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel)
    run_cli("run_defense_surface", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel)
    run_cli("evaluate_defense", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel, "--defense_folder", "defense_surface_res")

    # latent-space attack variant — the paper's second headline attack
    # (reference: attacker/runner_attacker.sh latent_space_attack leg:
    # loss_adv latent, dist_weight 150.0, same chamfer dist loss)
    run_cli("run_attack", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel, "--num_pc_for_attack", "2",
            "--num_pc_for_target", "2", "--num_iterations", "5",
            "--num_iterations_thresh", "3", "--use_mesh", "0",
            "--loss_adv_type", "latent", "--dist_weight_list", "150.0",
            "--output_folder_name", "latent_space_attack")
    latent_dir = osp.join(eval_dir, "latent_space_attack")
    lm = np.load(osp.join(latent_dir, "sphere", "adversarial_metrics.npy"))
    assert lm.shape == (1, 8, 5)
    lw = np.load(osp.join(latent_dir, "sphere", "dist_weight.npy"))
    np.testing.assert_array_equal(lw, [150.0])
    run_cli("get_dists_per_point", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel, "--attack_folder", "latent_space_attack")
    assert osp.exists(
        osp.join(latent_dir, "sphere", "adversarial_pc_input_dists.npy")
    )
    run_cli("evaluate_attack", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel,
            "--output_folder_name", "latent_space_attack")
    assert osp.exists(
        osp.join(latent_dir, "over_classes", "eval_stats.txt")
    )

    run_cli("train_classifier", *common, "--ae_folder", ae,
            "--data_folder", "data/tiny", "--max_epoch", "2",
            "--batch_size", "8")
    assert osp.exists(osp.join(eval_dir, "pc_pred_labels_test_set_13l.npy"))
    run_cli("tst_classifier", *common, "--ae_folder", ae)
    run_cli("run_classifier", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel, "--data_type", "adversarial")
    run_cli("evaluate_classifier", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel, "--data_type", "adversarial",
            "--classification_type", "hit_target")

    out = run_cli("train_transfer", *common, "--ae_type", "atlasnet",
                  "--ae_folder", ae, "--data_folder", "data/tiny",
                  "--epochs", "2", "--batch_size", "8",
                  "--number_points", "64")
    # per-epoch held-out eval (reference: atlasnet trainer test_epoch /
    # train_foldingnet.py validation prints)
    assert "val loss:" in out, out[-2000:]
    run_cli("tst_transfer", *common, "--ae_type", "atlasnet",
            "--train_folder", "log/atlasnet_for_transfer",
            "--ae_folder", ae, "--number_points", "64")
    at_eval = osp.join(d, "log/atlasnet_for_transfer", "eval")
    assert osp.exists(
        osp.join(at_eval, "reconstructions_test_set_13l.npy"))
    assert osp.exists(osp.join(at_eval, "ae_loss_test_set_13l.npy"))
    assert "test loss:" in open(osp.join(at_eval, "test_stats.txt")).read()
    run_cli("run_transfer", *common, "--transfer_ae_type", "AtlasNet",
            "--transfer_ae_folder", "log/atlasnet_for_transfer",
            "--ae_folder", ae, "--attack_pc_idx", sel)
    tm = np.load(
        osp.join(attack_dir, "transfer_res_atlasnet", "sphere",
                 "transfer_metrics.npy")
    )
    assert tm.shape == (1, 8, 4)
    run_cli("evaluate_transfer", *common, "--transfer_ae_type", "AtlasNet",
            "--ae_folder", ae, "--attack_pc_idx", sel)
    assert osp.exists(
        osp.join(attack_dir, "transfer_res_atlasnet", "over_classes",
                 "eval_stats.txt")
    )

    # FoldingNet transfer leg (reference: transfer/runner_foldingnet.sh ->
    # run_transfer.py FoldingNet -> evaluate_transfer.py); decoder output is
    # the fixed 45x45 fold grid = 2025 points regardless of input size
    out = run_cli("train_transfer", *common, "--ae_type", "foldingnet",
                  "--ae_folder", ae, "--data_folder", "data/tiny",
                  "--epochs", "1", "--batch_size", "8")
    assert "val loss:" in out and "middle val loss:" in out, out[-2000:]
    out = run_cli("tst_transfer", *common, "--ae_type", "foldingnet",
                  "--train_folder", "log/foldingnet_for_transfer",
                  "--ae_folder", ae)
    # the reference's tst_foldingnet prints final + middle-fold test losses
    # (transfer/foldingnet/tst_foldingnet.py:98)
    assert "test loss:" in out and "middle test loss:" in out, out[-2000:]
    fn_eval = osp.join(d, "log/foldingnet_for_transfer", "eval")
    frec_clean = np.load(
        osp.join(fn_eval, "reconstructions_test_set_13l.npy"))
    assert frec_clean.shape[-2:] == (2025, 3), frec_clean.shape
    run_cli("run_transfer", *common, "--transfer_ae_type", "FoldingNet",
            "--transfer_ae_folder", "log/foldingnet_for_transfer",
            "--ae_folder", ae, "--attack_pc_idx", sel)
    ftm = np.load(
        osp.join(attack_dir, "transfer_res_foldingnet", "sphere",
                 "transfer_metrics.npy")
    )
    assert ftm.shape == (1, 8, 4)
    frec = np.load(
        osp.join(attack_dir, "transfer_res_foldingnet", "sphere",
                 "transferred_pc_recon.npy")
    )
    assert frec.shape[-2:] == (2025, 3), frec.shape
    run_cli("evaluate_transfer", *common, "--transfer_ae_type", "FoldingNet",
            "--ae_folder", ae, "--attack_pc_idx", sel)
    assert osp.exists(
        osp.join(attack_dir, "transfer_res_foldingnet", "over_classes",
                 "eval_stats.txt")
    )

    _check_goldens(d, eval_dir, attack_dir)


# golden-name -> path relative to the stage dirs; one small artifact per
# pipeline stage (metrics npy / stats txt), bit-compared
def _golden_map(project_dir, eval_dir, attack_dir):
    return {
        # tst_ae
        "ae_loss_test_set.npy": osp.join(eval_dir, "ae_loss_test_set_13l.npy"),
        "latent_vectors_test_set.npy": osp.join(
            eval_dir, "latent_vectors_test_set_13l.npy"),
        # prepare_indices
        "chamfer_nn_idx.npy": osp.join(
            eval_dir, "chamfer_nn_idx_complete_test_set_13l.npy"),
        "latent_nn_idx.npy": osp.join(
            eval_dir, "latent_nn_idx_test_set_13l.npy"),
        # run_attack (output-space + latent-space variants)
        "adversarial_metrics_sphere.npy": osp.join(
            attack_dir, "sphere", "adversarial_metrics.npy"),
        "adversarial_metrics_latent_sphere.npy": osp.join(
            eval_dir, "latent_space_attack", "sphere",
            "adversarial_metrics.npy"),
        # get_dists_per_point
        "adversarial_pc_input_dists_sphere.npy": osp.join(
            attack_dir, "sphere", "adversarial_pc_input_dists.npy"),
        # evaluate_attack
        "attack_eval_stats.txt": osp.join(
            attack_dir, "over_classes", "eval_stats.txt"),
        "source_target_norm_min_idx_sphere.npy": osp.join(
            attack_dir, "sphere", "analysis_results",
            "source_target_norm_min_idx.npy"),
        # defenses
        "defense_critical_metrics_sphere.npy": osp.join(
            attack_dir, "defense_critical_res", "sphere",
            "defense_metrics.npy"),
        "defense_surface_metrics_sphere.npy": osp.join(
            attack_dir, "defense_surface_res", "sphere",
            "defense_metrics.npy"),
        # classifier
        "pc_pred_labels_test_set.npy": osp.join(
            eval_dir, "pc_pred_labels_test_set_13l.npy"),
        # transfers
        "transfer_metrics_atlasnet_sphere.npy": osp.join(
            attack_dir, "transfer_res_atlasnet", "sphere",
            "transfer_metrics.npy"),
        "transfer_metrics_foldingnet_sphere.npy": osp.join(
            attack_dir, "transfer_res_foldingnet", "sphere",
            "transfer_metrics.npy"),
        # tst_transfer (clean-test-set transfer eval)
        "transfer_test_loss_atlasnet.npy": osp.join(
            project_dir, "log/atlasnet_for_transfer", "eval",
            "ae_loss_test_set_13l.npy"),
        "transfer_test_loss_foldingnet.npy": osp.join(
            project_dir, "log/foldingnet_for_transfer", "eval",
            "ae_loss_test_set_13l.npy"),
    }


def _check_goldens(project_dir, eval_dir, attack_dir):
    mapping = _golden_map(project_dir, eval_dir, attack_dir)
    if os.environ.get("UPDATE_GOLDENS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        for name, src in mapping.items():
            shutil.copy(src, osp.join(GOLDEN_DIR, name))
        pytest.skip("goldens regenerated — rerun to compare")
    if not osp.isdir(GOLDEN_DIR):
        pytest.skip("no goldens checked in")
    for name, src in mapping.items():
        golden = osp.join(GOLDEN_DIR, name)
        assert osp.exists(golden), f"missing golden {name}"
        if name.endswith(".txt"):
            got, want = open(src).read(), open(golden).read()
            assert got == want, (
                f"golden text drift in {name}:\n--- got ---\n{got}\n"
                f"--- golden ---\n{want}"
            )
        else:
            got, want = np.load(src), np.load(golden)
            assert got.shape == want.shape and got.dtype == want.dtype, name
            np.testing.assert_array_equal(
                got, want, err_msg=f"golden drift in {name} "
                "(bit-wise; a numeric regression in some pipeline stage)"
            )


def test_emd_pipeline_leg(tmp_path):
    """EMD end-to-end: train an --loss emd victim AE, produce its eval
    artifacts, and run an attack whose adversarial/distance losses flow
    through the repaired EMD semantics (the reference's EMD attack branch is
    dead code — src/adv_ae.py:122-124; SURVEY §7 says rebuild the working
    surface). This integration-tests the ~1,170-LoC-equivalent op beyond the
    unit suite (reference: external/structural_losses/tf_approxmatch.py)."""
    d = str(tmp_path)
    ae = "log/autoencoder_emd"
    sel = f"{ae}/eval/sel_idx_rand_2_test_set_13l.npy"
    common = ["--project_dir", d]

    run_cli("make_synthetic_data", *common, "--data_folder", "data/tiny",
            "--class_names", "sphere", "cube",
            "--n_per_class", "40", "--n_points", "64")
    run_cli("train_ae", *common, "--data_folder", "data/tiny",
            "--n_points", "64", "--bneck_size", "16", "--batch_size", "10",
            "--training_epochs", "2", "--loss", "emd", "--train_folder", ae)
    # the epoch loss is EMD divided by the point count
    # (reference: src/pointnet_ae.py:135-136)
    stats = open(osp.join(d, ae, "train_stats.txt")).read()
    assert len(stats.splitlines()) >= 1

    run_cli("tst_ae", *common, "--data_folder", "data/tiny",
            "--train_folder", ae)
    run_cli("prepare_indices_for_attack", *common, "--ae_folder", ae,
            "--get_rand_idx", "1", "--get_latent_nn_idx", "1",
            "--get_chamfer_nn_idx", "1", "--num_instance_per_class", "2")
    run_cli("run_attack", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel, "--num_pc_for_attack", "2",
            "--num_pc_for_target", "2", "--num_iterations", "4",
            "--num_iterations_thresh", "2", "--use_mesh", "0")
    attack_dir = osp.join(d, ae, "eval", "attack_res")
    m = np.load(osp.join(attack_dir, "sphere", "adversarial_metrics.npy"))
    # 2 sources x 1 target class x 2 targets = 4 pairs
    assert m.shape == (1, 4, 5), m.shape
    assert np.isfinite(m).all() and (m[..., 4] > 0).all()

    run_cli("get_dists_per_point", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel)
    run_cli("evaluate_attack", *common, "--ae_folder", ae,
            "--attack_pc_idx", sel)
    assert osp.exists(
        osp.join(attack_dir, "over_classes", "eval_stats.txt"))

    # golden: EMD-attack metrics, bit-compared
    name = "adversarial_metrics_emd_sphere.npy"
    src = osp.join(attack_dir, "sphere", "adversarial_metrics.npy")
    golden = osp.join(GOLDEN_DIR, name)
    if os.environ.get("UPDATE_GOLDENS"):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        shutil.copy(src, golden)
        pytest.skip("golden regenerated — rerun to compare")
    if not osp.exists(golden):
        pytest.skip("no golden checked in")
    np.testing.assert_array_equal(
        np.load(src), np.load(golden),
        err_msg=f"golden drift in {name}",
    )
