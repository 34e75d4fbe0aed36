"""Multi-host execution path: 2-process jax.distributed over CPU devices.

The reference is single-process/single-GPU (SURVEY §2.3); the framework's
beyond-reference claim is `parallel/distributed.py` — this test actually
executes it: two OS processes, each with 2 virtual CPU devices, form a
4-device global mesh, assemble host-local batches into one globally sharded
array, and run a sharded AE train step whose gradient all-reduce crosses the
process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # minutes-scale; quick tier runs -m "not slow"


_WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env(repo_root):
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_pair(cmds, env, timeout=300):
    procs = [
        subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=e,
        )
        for cmd, e in zip(cmds, env)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    return outs


def test_two_process_distributed_train_step(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = _clean_env(repo_root)
    outs = _run_pair(
        [
            [sys.executable, _WORKER, coordinator, "2", str(pid),
             str(tmp_path)]
            for pid in range(2)
        ],
        [env, env],
    )

    # every process reports success and the SAME global losses (the batch is
    # globally sharded and the program is SPMD — any divergence means the
    # collective didn't span both processes)
    lines = [
        line for out in outs for line in out.splitlines()
        if line.startswith("DISTRIBUTED_OK")
    ]
    assert len(lines) == 2, outs
    losses = {line.split("loss=")[1] for line in lines}
    assert len(losses) == 1, lines

    # cross-process sharded attack: both processes agree ...
    alines = [
        line for out in outs for line in out.splitlines()
        if line.startswith("ATTACK_OK")
    ]
    assert len(alines) == 2, outs
    assert len({line.split("sum=")[1] for line in alines}) == 1, alines

    # ... and the gathered metrics equal a single-process run of the
    # identical attack (sharded-vs-single across the process boundary)
    import numpy as np

    from geometric_adv_tpu.attack.core import AttackRunner
    from geometric_adv_tpu.train import AETrainer, Configuration

    two_proc = np.load(tmp_path / "attack_metrics_2proc.npy")
    conf = Configuration(
        n_input=[32, 3], bneck_size=8, encoder_filters=[8, 16, 8],
        decoder_sizes=[16, 16], batch_size=8, learning_rate=0.01,
        loss_adv_type="chamfer", loss_dist_type="chamfer",
        dist_weight_list=[1.0], num_iterations=5, num_iterations_thresh=3,
        saver_step=None,
    )
    trainer = AETrainer(conf)  # same deterministic init as the workers
    runner = AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats, conf
    )
    arng = np.random.RandomState(7)
    src = arng.rand(8, 32, 3).astype(np.float32) - 0.5
    tgt = arng.rand(8, 32, 3).astype(np.float32) - 0.5
    single = runner.attack(
        src, np.zeros((8, conf.bneck_size), np.float32), tgt,
        np.ones(8, np.float32), batch_size=8,
    )
    np.testing.assert_allclose(
        two_proc, single.metrics, rtol=1e-5, atol=1e-6,
        err_msg="sharded (2-process) attack diverged from single-process",
    )


def test_two_process_train_ae_cli_matches_single(tmp_path):
    """A real pipeline stage (train_ae) runs multi-process end-to-end via the
    GAT_* env vars alone — no code changes — and its checkpoint matches the
    single-process run (VERDICT r2 item 3: multi-host usability)."""
    import numpy as np

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = str(tmp_path)
    base_env = _clean_env(repo_root)
    base_env["JAX_PLATFORMS"] = "cpu"

    def cli(module, *args, env=None):
        r = subprocess.run(
            [sys.executable, "-m", f"geometric_adv_tpu.cli.{module}", *args],
            env=env or base_env, capture_output=True, text=True, timeout=300,
        )
        assert r.returncode == 0, f"{module}:\n{r.stdout}\n{r.stderr}"
        return r

    cli("make_synthetic_data", "--project_dir", d, "--data_folder",
        "data/tiny", "--class_names", "sphere", "cube",
        "--n_per_class", "20", "--n_points", "32")

    common = ["--project_dir", d, "--data_folder", "data/tiny",
              "--n_points", "32", "--bneck_size", "8", "--batch_size", "8",
              "--training_epochs", "2"]
    r1 = cli("train_ae", *common, "--train_folder", "log/ae_1proc")

    port = _free_port()
    envs = []
    for pid in range(2):
        e = dict(base_env)
        e["GAT_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        e["GAT_NUM_PROCESSES"] = "2"
        e["GAT_PROCESS_ID"] = str(pid)
        envs.append(e)
    outs = _run_pair(
        [
            [sys.executable, "-m", "geometric_adv_tpu.cli.train_ae",
             *common, "--train_folder", "log/ae_2proc"]
            for _ in range(2)
        ],
        envs,
    )

    # The strongest invariant: the per-epoch loss trajectory. Identical
    # batch schedule + cross-process gradient all-reduce must reproduce the
    # single-process losses to f32 reduction noise (measured 1.5e-8); a
    # logical desync (wrong batches, missing collective) shifts the 3rd-4th
    # digit.
    def losses_of(text):
        return [
            float(line.split("loss=")[1])
            for line in text.splitlines()
            if line.startswith("Epoch:")
        ]

    l_single = losses_of(r1.stdout)
    l_multi = losses_of(outs[0])
    assert len(l_single) == len(l_multi) == 2, (l_single, l_multi)
    np.testing.assert_allclose(l_single, l_multi, rtol=1e-5)

    from geometric_adv_tpu.train import AETrainer, Configuration
    from geometric_adv_tpu.train import checkpoint as ckpt

    e1 = ckpt.latest_epoch(os.path.join(d, "log/ae_1proc"))
    e2 = ckpt.latest_epoch(os.path.join(d, "log/ae_2proc"))
    assert e1 == e2 and e1 is not None

    # Functional equality, not raw-parameter equality: the conv biases are
    # BN-degenerate directions (their gradient through BatchNorm is pure
    # f32 reduction noise, and Adam normalises noise steps to +/-lr), so two
    # different-but-correct reduction orders drift there by ~lr*steps while
    # the FUNCTION stays identical (measured: epoch losses agree to 1.5e-8,
    # reconstructions to ~1e-5; the bias drift is 3e-3).
    conf = Configuration.load(os.path.join(d, "log/ae_1proc", "configuration"))
    conf.train_dir = None
    from geometric_adv_tpu.data import load_dataset

    probe_ds, _, _ = load_dataset(
        ["sphere"], "test_set", os.path.join(d, "data/tiny")
    )
    probe = probe_ds.point_clouds[:8].astype(np.float32)
    recons, losses = [], []
    for folder in ("log/ae_1proc", "log/ae_2proc"):
        tr = AETrainer(conf)
        tr.restore(os.path.join(d, folder), e1)
        r, loss = tr.reconstruct(probe)
        recons.append(r)
        losses.append(loss)
    # Loose backstop: BN moving stats absorb the degenerate-bias drift only
    # partially at this tiny training length, so recon inherits O(1e-3); a
    # real desync lands far outside 5e-3.
    np.testing.assert_allclose(
        recons[0], recons[1], atol=5e-3,
        err_msg="2-process train_ae checkpoint functionally diverged",
    )
    np.testing.assert_allclose(losses[0], losses[1], rtol=5e-3)


def test_four_process_distributed_stages(tmp_path):
    """N=4 processes (8 global devices): train + attack + the sharded
    chamfer-matrix job + the defense stages' gather-heavy batched-forward
    path, all crossing the process boundary (VERDICT r4 #5). Every process
    must agree on every stage's result, and the gathered artifacts must
    equal single-process runs."""
    import numpy as np

    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = _clean_env(repo_root)
    n_procs = 4
    outs = _run_pair(
        [
            [sys.executable, _WORKER, coordinator, str(n_procs), str(pid),
             str(tmp_path), "full"]
            for pid in range(n_procs)
        ],
        [env] * n_procs,
        timeout=600,
    )

    import re

    for marker in ("DISTRIBUTED_OK", "ATTACK_OK", "MATRIX_OK", "DEFENSE_OK"):
        lines = [
            line for out in outs for line in out.splitlines()
            if line.startswith(marker)
        ]
        assert len(lines) == n_procs, (marker, outs)
        # cross-process agreement: every process reports the identical
        # values (strip only the per-process id field)
        stripped = {re.sub(r"proc=\d+", "proc=*", line) for line in lines}
        assert len(stripped) == 1, lines

    # gathered artifacts == single-process reference runs
    from geometric_adv_tpu.ops.pairwise import chamfer_distance_matrix
    from geometric_adv_tpu.train import AETrainer, Configuration

    mrng = np.random.RandomState(11)
    clouds = mrng.rand(10, 32, 3).astype(np.float32)
    mat_single = chamfer_distance_matrix(
        clouds, pair_block=8, blocks_per_chunk=3, mesh=None
    )
    np.testing.assert_allclose(
        np.load(tmp_path / "matrix.npy"), mat_single, rtol=1e-5, atol=1e-7,
        err_msg="4-process sharded chamfer matrix diverged",
    )

    conf = Configuration(
        n_input=[32, 3], bneck_size=8, encoder_filters=[8, 16, 8],
        decoder_sizes=[16, 16], batch_size=8, learning_rate=0.01,
        saver_step=None, held_out_step=None,
    )
    trainer = AETrainer(conf)  # same deterministic init as the workers
    drng = np.random.RandomState(12)
    probe = drng.rand(14, 32, 3).astype(np.float32) - 0.5
    recon_single = trainer.get_reconstructions(probe, batch_size=14)
    np.testing.assert_allclose(
        np.load(tmp_path / "defense_recon.npy"), recon_single,
        rtol=1e-5, atol=1e-6,
        err_msg="4-process gathered reconstructions diverged",
    )
    amax_single, _ = trainer.get_pre_symmetry_argmax(probe, batch_size=14)
    np.testing.assert_array_equal(
        np.load(tmp_path / "defense_amax.npy"), amax_single
    )
