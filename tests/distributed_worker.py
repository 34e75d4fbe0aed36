"""Worker process for the multi-host (2-process) distributed test.

Each process: initialise the jax.distributed runtime over a CPU backend
(2 virtual local devices -> 4 global), build the global mesh, assemble its
host-local batch into a globally sharded array, and run ONE sharded AE train
step. Prints the loss so the parent test can assert cross-process agreement.

Usage: python distributed_worker.py <coordinator_addr> <num_procs> <proc_id>
           [out_dir]

With ``out_dir``, process 0 additionally saves the metrics of a small
cross-process sharded attack (attack_metrics_2proc.npy) so the parent test
can assert sharded-vs-single attack equality across the process boundary.
"""

import os
import sys

# Force the CPU backend with 2 virtual devices BEFORE jax initialises (the
# session sitecustomize pins jax to the tunneled TPU otherwise).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    .replace("--xla_force_host_platform_device_count=8", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from geometric_adv_tpu.parallel.distributed import (  # noqa: E402
    host_local_batch_to_global,
    initialize_distributed,
)
from geometric_adv_tpu.parallel.mesh import get_mesh  # noqa: E402
from geometric_adv_tpu.train import AETrainer, Configuration  # noqa: E402


def main():
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    initialize_distributed(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.device_count() == 2 * num_procs, jax.device_count()
    assert jax.local_device_count() == 2

    mesh = get_mesh()  # 1-D global mesh over all 4 devices

    conf = Configuration(
        n_input=[32, 3],
        bneck_size=8,
        encoder_filters=[8, 16, 8],
        decoder_sizes=[16, 16],
        batch_size=8,
        learning_rate=0.01,
        saver_step=None,
        held_out_step=None,
    )
    trainer = AETrainer(conf)  # identical init on every process (seed 42)

    # Each host contributes a DIFFERENT local quarter of the global batch.
    rng = np.random.RandomState(100 + proc_id)
    local = rng.rand(4, 32, 3).astype(np.float32) - 0.5
    global_x = host_local_batch_to_global(local, mesh)
    assert global_x.shape == (4 * num_procs, 32, 3), global_x.shape
    assert not global_x.is_fully_addressable  # truly multi-host sharded

    # One sharded train step: host (numpy) state replicates, the batch axis
    # is sharded over the mesh; XLA inserts the gradient all-reduce.
    state_host = jax.device_get(trainer.state)
    new_state, loss, _ = trainer._jit_train_step(state_host, global_x, global_x)
    loss = float(loss)

    # A second step from the updated (now device-resident, replicated)
    # state proves the state pytree round-trips through the sharded program.
    # (No loss2 < loss assert: one Adam step on a tiny random batch is not
    # guaranteed to descend; the robust invariant is cross-process loss
    # agreement, which the parent test checks.)
    _, loss2, _ = trainer._jit_train_step(new_state, global_x, global_x)
    loss2 = float(loss2)
    assert np.isfinite(loss) and np.isfinite(loss2)

    print(f"DISTRIBUTED_OK proc={proc_id} loss={loss:.10f} loss2={loss2:.10f}")

    # --- cross-process sharded ATTACK: the scanned attack program runs
    # over the 4-device global mesh (pair batch sharded 2 rows/process);
    # the parent test compares the gathered metrics against a
    # single-process run of the identical attack.
    if len(sys.argv) > 4:
        from geometric_adv_tpu.attack.core import AttackRunner

        aconf = Configuration(
            n_input=[32, 3],
            bneck_size=8,
            encoder_filters=[8, 16, 8],
            decoder_sizes=[16, 16],
            batch_size=8,
            learning_rate=0.01,
            loss_adv_type="chamfer",
            loss_dist_type="chamfer",
            dist_weight_list=[1.0],
            num_iterations=5,
            num_iterations_thresh=3,
            saver_step=None,
        )
        runner = AttackRunner(
            trainer.model, trainer.state.params, trainer.state.batch_stats,
            aconf, mesh=mesh,
        )
        arng = np.random.RandomState(7)
        src = arng.rand(8, 32, 3).astype(np.float32) - 0.5
        tgt = arng.rand(8, 32, 3).astype(np.float32) - 0.5
        tz = np.zeros((8, aconf.bneck_size), np.float32)
        ref = np.ones(8, np.float32)
        out = runner.attack(src, tz, tgt, ref, batch_size=8)
        if jax.process_index() == 0:
            np.save(
                os.path.join(sys.argv[4], "attack_metrics_2proc.npy"),
                out.metrics,
            )
        print(f"ATTACK_OK proc={proc_id} sum={float(out.metrics.sum()):.8f}")

    # --- extended legs (the N=4 test): the sharded all-pairs chamfer
    # matrix job and a gather-heavy inference stage (the defense stages'
    # _batched_forward path: pad_to_multiple + shard_host_batch +
    # gather_global across the process boundary).
    if len(sys.argv) > 5 and sys.argv[5] == "full":
        from geometric_adv_tpu.ops.pairwise import chamfer_distance_matrix

        mrng = np.random.RandomState(11)
        clouds = mrng.rand(10, 32, 3).astype(np.float32)
        mat = chamfer_distance_matrix(
            clouds, pair_block=jax.device_count(), blocks_per_chunk=3,
            mesh=mesh,
        )
        print(f"MATRIX_OK proc={proc_id} sum={float(mat.sum()):.8f}")

        # defense-style gather: batched inference with a ragged batch (14
        # rows over an 8-device mesh forces pad_to_multiple) + the
        # pre-symmetry argmax reduction the critical-points defense uses
        trainer_m = AETrainer(conf, mesh=mesh)
        drng = np.random.RandomState(12)
        probe = drng.rand(14, 32, 3).astype(np.float32) - 0.5
        recon = trainer_m.get_reconstructions(probe, batch_size=14)
        amax, _ = trainer_m.get_pre_symmetry_argmax(probe, batch_size=14)
        if jax.process_index() == 0:
            np.save(os.path.join(sys.argv[4], "defense_recon.npy"), recon)
            np.save(os.path.join(sys.argv[4], "defense_amax.npy"), amax)
            np.save(os.path.join(sys.argv[4], "matrix.npy"), mat)
        print(
            f"DEFENSE_OK proc={proc_id} sum={float(np.sum(recon)):.8f} "
            f"amax={int(np.sum(amax))}"
        )


if __name__ == "__main__":
    main()
