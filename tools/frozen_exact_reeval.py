"""Exact re-evaluation of the frozen-10 attack's SAVED clouds vs the exact
run's, on the same reassembled source/target pairs (CPU, sampled).

The in-scan recorded metrics of the frozen run MAJORIZE its true values
(PARITY #13), so the earlier per-pair metric comparison is an upper bound.
This measures the actual attack quality both runs delivered: exact
chamfer S-CD(adv, source) and T-RE(recon, target) recomputed from the
saved adversarial_pc_input / adversarial_pc_recon artifacts.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import os.path as osp
import numpy as np

from geometric_adv_tpu.cli.common import AttackContext, NN_IDX_DICT
from geometric_adv_tpu.utils.artifacts import load_data
from geometric_adv_tpu.ops import chamfer_loss_per_pc

root = "/tmp/fullrun5"
sel = "log/autoencoder_victim/eval/sel_idx_rand_25_test_set_13l.npy"
ctx = AttackContext(root, "log/autoencoder_victim",
                    attack_folder="attack_res",
                    attack_pc_idx=osp.join(root, sel),
                    num_pc_for_attack=25)
ctx.nn_idx = load_data(ctx.data_path, ctx.files,
                       [NN_IDX_DICT[ctx.conf.target_pc_idx_type]])

rng = np.random.RandomState(0)
classes = ["sphere", "cone"]
rows = []
for cls in classes:
    src, tgt = ctx.class_attack_data(cls, ctx.point_clouds)
    n = len(src)
    idx = rng.choice(n, 192, replace=False)
    for run in ("attack_res", "attack_res_frozen10"):
        d = osp.join(ctx.data_path, run, cls)
        adv = np.load(osp.join(d, "adversarial_pc_input.npy"))[0]
        rec = np.load(osp.join(d, "adversarial_pc_recon.npy"))[0]
        scd = np.zeros(len(idx)); tre = np.zeros(len(idx))
        for k in range(0, len(idx), 32):
            j = idx[k:k + 32]
            scd[k:k + 32] = np.asarray(chamfer_loss_per_pc(adv[j], src[j]))
            tre[k:k + 32] = np.asarray(chamfer_loss_per_pc(rec[j], tgt[j]))
        rows.append((cls, run, scd.mean(), tre.mean(),
                     (scd + tre).mean()))

print(f"{'class':>8} {'run':>22} {'S-CD':>10} {'T-RE':>10} {'Score':>10}")
for cls, run, s, t, sc in rows:
    print(f"{cls:>8} {run:>22} {s:.6f}  {t:.6f}  {sc:.6f}")
for cls in classes:
    r = {run: (s, t, sc) for c, run, s, t, sc in rows if c == cls}
    e, f = r["attack_res"], r["attack_res_frozen10"]
    print(f"{cls}: frozen/exact exact-measured ratios "
          f"S-CD {f[0]/e[0]:.3f}  T-RE {f[1]/e[1]:.3f}  Score {f[2]/e[2]:.3f}")
