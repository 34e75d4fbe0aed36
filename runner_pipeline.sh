#!/bin/bash
# Full pipeline orchestration (the reference's runner_*.sh scripts rolled
# into one; each stage can also be run individually).
#
# Usage: bash runner_pipeline.sh [quick|full]
#   quick: small synthetic dataset + short training, for smoke runs
#   full:  reference-scale settings (2048 pts, 500 epochs, 25 sources, ...)
set -e

MODE=${1:-quick}
PY="python -m"

# Stage runner with retry. Through a remote TPU relay the FIRST backend init
# of a fresh process can fail (UNAVAILABLE / FAILED_PRECONDITION) in the
# window right after the previous stage's process exits — the device grant
# takes a moment to release. Every stage regenerates its own outputs
# (idempotent), so the whole stage is retried with backoff; the final
# attempt propagates its failure through set -e.
run() {
  local delay
  for delay in 30 90 180; do
    "$@" && return 0
    echo "stage failed: $* — retrying in ${delay}s" >&2
    sleep "$delay"
  done
  "$@"
}

if [ "$MODE" = "quick" ]; then
  N_POINTS=512; N_PER_CLASS=30; EPOCHS=40; CLS_EPOCHS=15; TR_EPOCHS=10
  NUM_ATTACK=4; NUM_TARGET=2; ITERS=250; THRESH=200; SEL=10; ABATCH=0
  DATA=data/synthetic_512
  CLASS_ARGS="--class_names sphere cube torus cone"
  ATLAS_ARGS="--nb_primitives 4 --template_type SQUARE --number_points 400"
  METRO_ARGS="--num_per_class 1 --n_samples 4000"
else
  N_POINTS=2048; N_PER_CLASS=250; EPOCHS=500; CLS_EPOCHS=100; TR_EPOCHS=100
  NUM_ATTACK=25; NUM_TARGET=5; ITERS=500; THRESH=400; SEL=25; ABATCH=500
  DATA=data/synthetic_2048
  CLASS_ARGS=""
  # reference AtlasNet transfer config: 25 SQUARE patches
  # (reference: transfer/atlasnet/runner_atlasnet.sh)
  ATLAS_ARGS="--nb_primitives 25 --template_type SQUARE"
  METRO_ARGS="--num_per_class 2"
fi

AE=log/autoencoder_victim
SEL_IDX=$AE/eval/sel_idx_rand_${SEL}_test_set_13l.npy

# 0. dataset (synthetic stand-in for ShapeNetCore; no egress)
run $PY geometric_adv_tpu.cli.make_synthetic_data \
  --data_folder $DATA --n_points $N_POINTS --n_per_class $N_PER_CLASS \
  $CLASS_ARGS

# 1. victim AE (runner_ae_for_attack.sh)
if [ "$MODE" = "quick" ]; then BS_ARG="--batch_size 24"; else BS_ARG=""; fi
run $PY geometric_adv_tpu.cli.train_ae --data_folder $DATA $CLASS_ARGS $BS_ARG \
  --n_points $N_POINTS --training_epochs $EPOCHS --train_folder $AE
run $PY geometric_adv_tpu.cli.tst_ae --data_folder $DATA --train_folder $AE

# 2. attack indices (runner_indices_for_attack.sh)
run $PY geometric_adv_tpu.cli.prepare_indices_for_attack --ae_folder $AE \
  --get_rand_idx 1 --get_latent_nn_idx 1 --get_chamfer_nn_idx 1 \
  --num_instance_per_class $SEL

# 3. attack + analysis (runner_attacker.sh). Attack batch 500 pairs per
# dispatch at full scale: the whole 1500-pair class grid at 2048 pts
# crashed the TPU worker (activation working set), 500 is the proven size.
run $PY geometric_adv_tpu.cli.run_attack --ae_folder $AE --attack_pc_idx $SEL_IDX \
  --num_pc_for_attack $NUM_ATTACK --num_pc_for_target $NUM_TARGET \
  --num_iterations $ITERS --num_iterations_thresh $THRESH --batch_size $ABATCH
run $PY geometric_adv_tpu.cli.get_dists_per_point --ae_folder $AE \
  --attack_pc_idx $SEL_IDX
run $PY geometric_adv_tpu.cli.evaluate_attack --ae_folder $AE \
  --attack_pc_idx $SEL_IDX

# 3b. latent-space attack variant (runner_attacker.sh second leg:
#     loss_adv latent, dist_weight 150.0)
run $PY geometric_adv_tpu.cli.run_attack --ae_folder $AE --attack_pc_idx $SEL_IDX \
  --num_pc_for_attack $NUM_ATTACK --num_pc_for_target $NUM_TARGET \
  --num_iterations $ITERS --num_iterations_thresh $THRESH \
  --batch_size $ABATCH \
  --loss_adv_type latent --dist_weight_list 150.0 \
  --output_folder_name latent_space_attack
run $PY geometric_adv_tpu.cli.get_dists_per_point --ae_folder $AE \
  --attack_pc_idx $SEL_IDX --attack_folder latent_space_attack
run $PY geometric_adv_tpu.cli.evaluate_attack --ae_folder $AE \
  --attack_pc_idx $SEL_IDX --output_folder_name latent_space_attack

# 4. defenses (runner_defender.sh)
run $PY geometric_adv_tpu.cli.run_defense_critical --ae_folder $AE \
  --attack_pc_idx $SEL_IDX
run $PY geometric_adv_tpu.cli.evaluate_defense --ae_folder $AE \
  --attack_pc_idx $SEL_IDX --defense_folder defense_critical_res
run $PY geometric_adv_tpu.cli.get_knn_dists_per_point --ae_folder $AE \
  --attack_pc_idx $SEL_IDX
run $PY geometric_adv_tpu.cli.run_defense_surface --ae_folder $AE \
  --attack_pc_idx $SEL_IDX
run $PY geometric_adv_tpu.cli.evaluate_defense --ae_folder $AE \
  --attack_pc_idx $SEL_IDX --defense_folder defense_surface_res

# 5. classifier (runner_classifier.sh)
run $PY geometric_adv_tpu.cli.train_classifier --ae_folder $AE \
  --data_folder $DATA --max_epoch $CLS_EPOCHS --bn_momentum 0.7
run $PY geometric_adv_tpu.cli.tst_classifier --ae_folder $AE
run $PY geometric_adv_tpu.cli.run_classifier --ae_folder $AE \
  --attack_pc_idx $SEL_IDX --data_type adversarial
run $PY geometric_adv_tpu.cli.run_classifier --ae_folder $AE \
  --attack_pc_idx $SEL_IDX --data_type target
run $PY geometric_adv_tpu.cli.evaluate_classifier --ae_folder $AE \
  --attack_pc_idx $SEL_IDX --data_type adversarial \
  --classification_type hit_target

# 6. transfer (runner_transfer.sh + runner_atlasnet/foldingnet.sh)
run $PY geometric_adv_tpu.cli.train_transfer --ae_type atlasnet \
  --ae_folder $AE --data_folder $DATA --epochs $TR_EPOCHS --bn_momentum 0.7 \
  $ATLAS_ARGS
run $PY geometric_adv_tpu.cli.tst_transfer --ae_type atlasnet \
  --train_folder log/atlasnet_for_transfer --ae_folder $AE
run $PY geometric_adv_tpu.cli.run_transfer --transfer_ae_type AtlasNet \
  --transfer_ae_folder log/atlasnet_for_transfer --ae_folder $AE \
  --attack_pc_idx $SEL_IDX
run $PY geometric_adv_tpu.cli.evaluate_transfer --transfer_ae_type AtlasNet \
  --ae_folder $AE --attack_pc_idx $SEL_IDX
# metro leg: sampled mesh-Hausdorff of the SQUARE-patch AtlasNet meshes vs
# the synthetic classes' analytic GT surfaces (reference metro pipeline,
# transfer/atlasnet/training/trainer_loss.py:60-101)
run $PY geometric_adv_tpu.cli.run_metro --ae_folder $AE $METRO_ARGS
run $PY geometric_adv_tpu.cli.train_transfer --ae_type foldingnet \
  --ae_folder $AE --data_folder $DATA --epochs $TR_EPOCHS --bn_momentum 0.7
run $PY geometric_adv_tpu.cli.tst_transfer --ae_type foldingnet \
  --train_folder log/foldingnet_for_transfer --ae_folder $AE
run $PY geometric_adv_tpu.cli.run_transfer --transfer_ae_type FoldingNet \
  --transfer_ae_folder log/foldingnet_for_transfer --ae_folder $AE \
  --attack_pc_idx $SEL_IDX
run $PY geometric_adv_tpu.cli.evaluate_transfer --transfer_ae_type FoldingNet \
  --ae_folder $AE --attack_pc_idx $SEL_IDX
# identity-transfer sanity: the victim as its own transfer AE must replay
# the attack's reconstructions (reference: transfer/run_transfer.py:181-204)
run $PY geometric_adv_tpu.cli.run_transfer --transfer_ae_type PointNet \
  --transfer_ae_folder $AE --ae_folder $AE --attack_pc_idx $SEL_IDX \
  --do_sanity_checks 1

echo "PIPELINE COMPLETE"
