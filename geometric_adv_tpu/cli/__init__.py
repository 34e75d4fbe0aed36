"""Pipeline stage CLIs — same entry points and artifact formats as the
reference's experiment drivers (reference: autoencoder/, attacker/,
defender/, classifier/, transfer/).

Run any stage as ``python -m geometric_adv_tpu.cli.<stage> [flags]``:

    make_synthetic_data    generate a ShapeNet-like PLY tree (no-egress envs)
    train_ae               train the victim AE            (train_ae.py)
    tst_ae                 dump eval artifacts            (tst_ae.py)
    prepare_indices_for_attack  random/latent-NN/chamfer-NN indices
    run_attack             the adversarial attack         (run_attack.py)
    get_dists_per_point    per-adv-point source distances
    evaluate_attack        attack analysis + eval_stats
    get_knn_dists_per_point kNN distance artifacts for the surface defense
    run_defense_critical   critical-points defense
    run_defense_surface    off-surface defense
    evaluate_defense       defense analysis + eval_stats
    train_classifier       PointNet classifier training
    tst_classifier         classifier test-set accuracy
    run_classifier         classify reconstructions per data_type
    evaluate_classifier    hit-target / avoid-source stats
    train_transfer         AtlasNet/FoldingNet/PointNet transfer AEs
    tst_transfer           transfer-AE clean-test-set eval artifacts
    run_transfer           reconstruct adv inputs with a transfer AE
    evaluate_transfer      transferability stats
    import_reference_ckpt  convert reference pretrained checkpoints to orbax
                           (AE/classifier TF ckpts, AtlasNet/FoldingNet torch)
    verify_tpu             on-device kernel/numerics checks (TPU hosts)
"""
