"""Compare the frozen-assignment attack leg vs the exact leg at FULLRUN
scale: per-pair metric deltas over all classes + the over_classes eval
stats side by side. CPU-only (reads .npy artifacts)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import glob
import os.path as osp
import sys

import numpy as np

base = sys.argv[1] if len(sys.argv) > 1 else "log/autoencoder_victim/eval"
exact_dir = osp.join(base, "attack_res")
frozen_dir = osp.join(base, sys.argv[2] if len(sys.argv) > 2 else "attack_res_frozen10")

cols = ["loss_adv", "loss_dist", "S-CD", "T-NRE", "T-RE"]
all_e, all_f = [], []
for cls_dir in sorted(glob.glob(osp.join(exact_dir, "*"))):
    cls = osp.basename(cls_dir)
    fe = osp.join(cls_dir, "adversarial_metrics.npy")
    ff = osp.join(frozen_dir, cls, "adversarial_metrics.npy")
    if not (osp.exists(fe) and osp.exists(ff)):
        continue
    all_e.append(np.load(fe))
    all_f.append(np.load(ff))
e = np.concatenate([a.reshape(-1, a.shape[-1]) for a in all_e])
f = np.concatenate([a.reshape(-1, a.shape[-1]) for a in all_f])
print(f"pairs compared: {len(e)} over {len(all_e)} classes")
for c in range(e.shape[1]):
    d = np.abs(e[:, c] - f[:, c])
    scale = np.maximum(np.abs(e[:, c]), 1e-9)
    print(
        f"{cols[c]:>9}: exact mean {e[:, c].mean():.6f}  frozen mean "
        f"{f[:, c].mean():.6f}  max|d| {d.max():.2e}  max rel "
        f"{(d / scale).max():.2e}  mean rel {(d / scale).mean():.2e}"
    )
for name, dd in (("exact", exact_dir), ("frozen", frozen_dir)):
    p = osp.join(dd, "over_classes", "eval_stats.txt")
    if osp.exists(p):
        print(f"--- {name} over_classes eval_stats.txt ---")
        print(open(p).read())
