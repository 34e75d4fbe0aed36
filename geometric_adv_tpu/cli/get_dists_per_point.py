"""Per-adversarial-point distance to the source cloud
(reference: attacker/get_dists_per_point.py) — sqrt of the NN squared
distance, saved as adversarial_pc_input_dists.npy per class."""

import argparse
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from geometric_adv_tpu.cli.common import AttackContext
from geometric_adv_tpu.ops import nn_distance


@jax.jit
def _dists(adv, src):
    d1, _, _, _ = nn_distance(adv, src)
    return jnp.sqrt(jnp.maximum(d1, 0.0))  # sqrt at reference :122


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ae_folder", type=str, default="log/autoencoder_victim")
    parser.add_argument("--attack_pc_idx", type=str, required=True)
    parser.add_argument(
        "--attack_folder", "--output_folder_name", dest="attack_folder",
        type=str, default="attack_res",
        help="attack output dir (reference flag name: --output_folder_name)",
    )
    parser.add_argument("--project_dir", type=str, default=".")
    parser.add_argument("--batch_size", type=int, default=100)
    flags = parser.parse_args()
    print("Get dists per point flags:", flags)

    ctx = AttackContext(
        flags.project_dir, flags.ae_folder, attack_folder=flags.attack_folder,
        attack_pc_idx=flags.attack_pc_idx,
    )

    for i, pc_class_name in ctx.classes_iter():
        load_dir = osp.join(ctx.attack_dir, pc_class_name)
        adversarial_pc_input = np.load(
            osp.join(load_dir, "adversarial_pc_input.npy")
        )
        source_pc, _ = ctx.class_attack_data(pc_class_name, ctx.point_clouds)

        num_w = adversarial_pc_input.shape[0]
        dists = np.zeros(adversarial_pc_input.shape[:-1], np.float32)
        for j in range(num_w):
            for s in range(0, len(source_pc), flags.batch_size):
                sl = slice(s, s + flags.batch_size)
                dists[j, sl] = np.asarray(
                    _dists(
                        adversarial_pc_input[j, sl],
                        source_pc[sl].astype(np.float32),
                    )
                )
        np.save(osp.join(load_dir, "adversarial_pc_input_dists"), dists)
        print(f"{pc_class_name}: saved adversarial_pc_input_dists "
              f"{dists.shape}")


if __name__ == "__main__":
    main()
