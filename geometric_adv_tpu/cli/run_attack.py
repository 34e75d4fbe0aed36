"""Run the geometric adversarial attack (reference: attacker/run_attack.py).

Per source class: assemble the source/target pair grid, run the scanned
attack over all dist weights, save the per-class artifacts
(adversarial_metrics / _pc_input / _pc_recon / dist_weight)."""

import argparse
import os.path as osp

import numpy as np

from geometric_adv_tpu.attack.core import AttackRunner
from geometric_adv_tpu.cli.common import AttackContext, ensure_dir, restore_victim
from geometric_adv_tpu.parallel import get_mesh


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--learning_rate", type=float, default=0.01)
    parser.add_argument("--loss_dist_type", type=str, default="chamfer")
    parser.add_argument("--loss_adv_type", type=str, default="chamfer")
    parser.add_argument("--dist_weight_list", nargs="+", default=[1.0])
    parser.add_argument("--max_point_pert_weight", type=float, default=0.0)
    parser.add_argument("--max_point_dist_weight", type=float, default=0.0)
    parser.add_argument("--num_iterations", type=int, default=500)
    parser.add_argument("--num_iterations_thresh", type=int, default=400)
    parser.add_argument(
        "--batch_size", type=int, default=0,
        help="pairs per jitted attack call; 0 = the whole class grid at once",
    )
    parser.add_argument("--ae_folder", type=str, default="log/autoencoder_victim")
    parser.add_argument("--restore_epoch", type=int, default=None)
    parser.add_argument("--attack_pc_idx", type=str, required=True)
    parser.add_argument(
        "--target_pc_idx_type", type=str, default="chamfer_nn_complete"
    )
    parser.add_argument("--num_pc_for_attack", type=int, default=25)
    parser.add_argument("--num_pc_for_target", type=int, default=5)
    parser.add_argument("--correct_pred_only", type=int, default=0)
    parser.add_argument("--output_folder_name", type=str, default="attack_res")
    parser.add_argument("--project_dir", type=str, default=".")
    parser.add_argument("--use_mesh", type=int, default=1)
    parser.add_argument("--matmul_precision", type=str, default=None)
    parser.add_argument(
        "--chamfer_impl", type=str, default="auto",
        choices=["auto", "fused", "composed"],
        help="chamfer-loss implementation: the fused Pallas loss+payload "
        "kernel vs the composed nn_distance path. Their ordering inverts "
        "with chip state (DESIGN.md); 'auto' runs the one-shot on-chip "
        "calibration and binds the session winner to this runner",
    )
    parser.add_argument(
        "--chamfer_refresh", type=int, default=0,
        help="frozen-assignment chamfer fast mode: recompute the NN "
        "assignments of both attack chamfers exactly every N iterations "
        "and hold them frozen (pure elementwise loss+grad) in between — "
        "3.7x (N=10) to 7x (N=50) at 2048 pts (PARITY #13 documents the "
        "metric deviation; validated vs exact at FULLRUN scale). 0 = exact "
        "every iteration (the parity default); 1 = refresh every step "
        "(matches exact)",
    )
    parser.add_argument(
        "--encoder_vjp", type=str, default="auto",
        choices=["auto", "sparse", "dense"],
        help="victim-encoder input-gradient path: 'sparse' backprops only "
        "the max-pool argmax rows (models/sparse_encode.py, n/bneck x less "
        "backward matmul work, first-argmax tie semantics); 'dense' is "
        "plain autodiff (even tie split); 'auto' = sparse on TPU, dense "
        "elsewhere (keeps CPU golden bits)",
    )
    parser.add_argument(
        "--trace_dir", type=str, default=None,
        help="capture a jax.profiler device trace of the FIRST class's "
        "attack into this directory (open with TensorBoard's profile "
        "plugin or ui.perfetto.dev)",
    )
    flags = parser.parse_args()
    print("Run attack flags:", flags)
    from geometric_adv_tpu.cli.common import set_matmul_precision

    set_matmul_precision(flags.matmul_precision)
    if flags.chamfer_impl != "auto":
        # a forced implementation also needs the GLOBAL routing pinned for
        # any chamfer_loss_per_pc sites outside the runner's bound program
        # (eval/metric paths); the runner itself gets the explicit
        # chamfer_impl below, which skips calibration
        import geometric_adv_tpu.ops.chamfer as chamfer_mod

        chamfer_mod.FUSED_LOSS_ENABLED = flags.chamfer_impl == "fused"
    if flags.encoder_vjp != "auto":
        import geometric_adv_tpu.models.sparse_encode as sparse_encode_mod

        sparse_encode_mod.SPARSE_ENCODER_VJP = (
            flags.encoder_vjp == "sparse"
        )

    assert flags.loss_dist_type in ("pert", "chamfer")
    assert flags.loss_adv_type in ("latent", "chamfer")
    assert flags.num_iterations_thresh <= flags.num_iterations
    assert flags.target_pc_idx_type in ("latent_nn", "chamfer_nn_complete")

    ctx = AttackContext(
        flags.project_dir, flags.ae_folder,
        attack_pc_idx=flags.attack_pc_idx,
        num_pc_for_attack=flags.num_pc_for_attack,
    )
    conf = ctx.conf
    # attack-config mutation (reference: run_attack.py:83-109); BN stays
    # frozen by construction (eval mode) — the b_norm_decay=1.0 analog.
    conf.ae_dir = ctx.ae_dir
    conf.ae_name = "autoencoder"
    conf.ae_restore_epoch = flags.restore_epoch
    conf.experiment_name = "adversary"
    conf.learning_rate = flags.learning_rate
    conf.loss_dist_type = flags.loss_dist_type
    conf.loss_adv_type = flags.loss_adv_type
    conf.dist_weight_list = [float(w) for w in flags.dist_weight_list]
    conf.max_point_pert_weight = flags.max_point_pert_weight
    conf.max_point_dist_weight = flags.max_point_dist_weight
    conf.target_pc_idx_type = flags.target_pc_idx_type
    conf.num_pc_for_attack = flags.num_pc_for_attack
    conf.num_pc_for_target = flags.num_pc_for_target
    conf.correct_pred_only = bool(flags.correct_pred_only)
    conf.num_iterations = flags.num_iterations
    conf.num_iterations_thresh = flags.num_iterations_thresh
    conf.chamfer_refresh = flags.chamfer_refresh

    output_path = ensure_dir(osp.join(ctx.data_path, flags.output_folder_name))
    conf.train_dir = output_path
    conf.save(osp.join(output_path, "attack_configuration"))

    # rebuild context so nn_idx matches the chosen target_pc_idx_type
    ctx.conf = conf
    from geometric_adv_tpu.cli.common import NN_IDX_DICT
    from geometric_adv_tpu.utils.artifacts import load_data

    ctx.nn_idx = load_data(
        ctx.data_path, ctx.files, [NN_IDX_DICT[conf.target_pc_idx_type]]
    )
    if conf.correct_pred_only and ctx.correct_pred is None:
        # the flag was set by this CLI, after AttackContext resolved it from
        # the (pre-mutation) AE config — reload like nn_idx above
        pc_labels, pc_pred_labels = load_data(
            ctx.data_path, ctx.files,
            ["pc_label_test_set", "pc_pred_labels_test_set"],
        )
        ctx.correct_pred = pc_labels == pc_pred_labels

    import jax

    mesh = get_mesh() if flags.use_mesh and len(jax.devices()) > 1 else None
    victim = restore_victim(conf, ctx.ae_dir, flags.restore_epoch, mesh=mesh)
    runner = AttackRunner(
        victim.model, victim.state.params, victim.state.batch_stats, conf,
        mesh=mesh, chamfer_impl=flags.chamfer_impl,
        batch_size=flags.batch_size or None,
    )
    # persist the traced-program routing next to the artifacts: fused and
    # composed grads differ in f32 summation order, so bitwise differences
    # between sessions must be attributable after the fact (ADVICE r4)
    import json

    with open(osp.join(output_path, "attack_impl.json"), "w") as f:
        json.dump(
            {
                "chamfer_impl_flag": flags.chamfer_impl,
                "chamfer_method": runner.chamfer_method,
                "chamfer_refresh": runner.chamfer_refresh,
                "attack_mode": runner.attack_mode,
                "encoder_vjp": flags.encoder_vjp,
            },
            f,
            indent=1,
        )

    for i, pc_class_name in ctx.classes_iter():
        print(f"attack shape class {pc_class_name} "
              f"({i + 1} of {len(ctx.pc_classes)})")
        save_dir = ensure_dir(osp.join(output_path, pc_class_name))

        source_pc, target_pc = ctx.class_attack_data(
            pc_class_name, ctx.point_clouds
        )
        _, target_latent = ctx.class_attack_data(
            pc_class_name, ctx.latent_vectors
        )
        _, target_ae_loss_ref = ctx.class_attack_data(
            pc_class_name, ctx.ae_loss
        )
        target_ae_loss_ref = target_ae_loss_ref.reshape(-1)

        import contextlib

        trace_cm = contextlib.nullcontext()
        if flags.trace_dir is not None and i == 0:
            from geometric_adv_tpu.utils.profiling import trace

            print(f"tracing this class's attack into {flags.trace_dir}")
            trace_cm = trace(flags.trace_dir)
        with open(osp.join(save_dir, "attack_stats.txt"), "a", 1) as fout:
            fout.write(f"Attack flags: {flags}\n")
            with trace_cm:
                out = runner.attack(
                    source_pc, target_latent, target_pc, target_ae_loss_ref,
                    batch_size=flags.batch_size or None, log_file=fout,
                )

        np.save(osp.join(save_dir, "adversarial_metrics"), out.metrics)
        np.save(osp.join(save_dir, "adversarial_pc_input"), out.pc_input)
        np.save(osp.join(save_dir, "adversarial_pc_recon"), out.pc_recon)
        np.save(
            osp.join(save_dir, "dist_weight"),
            np.array(conf.dist_weight_list),
        )


if __name__ == "__main__":
    main()
