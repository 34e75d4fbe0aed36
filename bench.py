"""Headline benchmark: attack iterations/sec per chip at 1024 points.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.md north star): the geometric adversarial attack loop —
per iteration: frozen victim-AE forward + backward w.r.t. the perturbation
(chamfer adversarial loss + chamfer distance loss) + Adam update + best-so-far
tracking, at 1024 points per cloud. One "iteration" = one Adam step for ONE
source/target pair (the reference steps a batch of 10 pairs per sess.run
round trip; we normalise to pairs so the number is batch-size independent).

Baseline: the reference publishes no numbers (BASELINE.md). Reference
structure: ~2 sess.run round trips per iteration on batch 10 on a V100
(reference: src/adv_ae.py:216-221). A generous V100 estimate — AE fwd+bwd +
2048-pt chamfer at batch 10 in ~8 ms/iteration — gives ~1250 pair-iters/sec;
that constant is the denominator for vs_baseline.
"""

import json
import time

import numpy as np

BASELINE_PAIR_ITERS_PER_SEC = 1250.0

N_POINTS = 1024
BATCH_PAIRS = 256
NUM_ITERS = 200
WARMUP_ITERS = 20


def main():
    import jax

    from geometric_adv_tpu.attack.core import AttackRunner
    from geometric_adv_tpu.parallel import get_mesh
    from geometric_adv_tpu.train import AETrainer, Configuration

    conf = Configuration(
        n_input=[N_POINTS, 3],
        bneck_size=128,
        batch_size=BATCH_PAIRS,
        learning_rate=0.01,
        loss_adv_type="chamfer",
        loss_dist_type="chamfer",
        dist_weight_list=[1.0],
        num_iterations=NUM_ITERS,
        num_iterations_thresh=NUM_ITERS // 2,
        saver_step=None,
    )
    trainer = AETrainer(conf)

    n_dev = len(jax.devices())
    mesh = get_mesh() if n_dev > 1 else None
    runner = AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats, conf,
        mesh=mesh,
    )

    rng = np.random.RandomState(0)
    x = rng.rand(BATCH_PAIRS, N_POINTS, 3).astype(np.float32) - 0.5
    gt = rng.rand(BATCH_PAIRS, N_POINTS, 3).astype(np.float32) - 0.5
    tz = trainer.get_latent_vectors(gt, batch_size=BATCH_PAIRS)
    ref = np.ones(BATCH_PAIRS, np.float32)

    # warmup: compile + one full run
    runner._attack_fn(x, tz, gt, ref, np.asarray([1.0], np.float32))[
        0
    ].block_until_ready()

    t0 = time.time()
    runner._attack_fn(x, tz, gt, ref, np.asarray([1.0], np.float32))[
        0
    ].block_until_ready()
    dt = time.time() - t0

    pair_iters_per_sec = BATCH_PAIRS * (NUM_ITERS + 1) / dt / max(n_dev, 1)
    print(
        json.dumps(
            {
                "metric": "attack_pair_iterations_per_sec_per_chip_1024pts",
                "value": round(pair_iters_per_sec, 1),
                "unit": "pair-iters/s",
                "vs_baseline": round(
                    pair_iters_per_sec / BASELINE_PAIR_ITERS_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
