"""Sparse (argmax-gathered) input-gradient for the frozen PointNet encoder.

The attack differentiates the victim AE w.r.t. its INPUT only — the weights
are frozen (reference: attacker/run_attack.py:88-90 freezes the victim;
src/adversary.py:39-57 optimizes the perturbation). The encoder is a
per-point MLP followed by a max-pool symmetry (reference:
src/encoders_decoders.py:37-68), so ``dz/dx`` is nonzero ONLY at the
<= bneck argmax rows of the pre-symmetry feature map: a channel's gradient
enters at exactly the point that produced its max. The dense XLA backward
nevertheless re-runs every layer's matmul over all ``n`` point rows
([b*n, c] x [c, c']); only ``bneck`` rows per example carry signal.

This module's custom-VJP ``encode``:

- forward: the ordinary flax apply (bit-identical ``z``) plus an argmax
  over the pre-pool map (XLA fuses it with the max: one extra reduction in
  the same pass, no extra materialization). Residuals: ``(x, idx)`` ONLY.
- backward: gathers the <= bneck argmax input rows ``x[idx]`` and RE-RUNS
  the per-point encoder on just those rows to recover the ReLU masks (a
  per-point MLP is row-independent, so the recomputed rows carry the
  original rows' exact mask bits — per-row dot products don't depend on
  how many rows sit beside them); then seeds a diagonal cotangent (channel
  c's gradient lives on gathered row c), runs the MLP backward chain
  ``G -> G*relu_mask -> G*bn_scale -> G @ W^T`` on [b, bneck, c] instead of
  [b, n, c] — ``n/bneck`` x less matmul work (8x at 1024 pts, 16x at
  2048) — and scatters the [b, bneck, 3] result back to point rows.

  The first version of this backward instead captured the full-resolution
  ReLU inputs with ``capture_intermediates`` in the forward; that
  materializes ~[b, n, sum(c_l)] of residuals to HBM (~700 MB/iter at
  [256, 1024]) and measured 5% SLOWER than dense autodiff at attack level
  on TPU — the matmul FLOPs it saved were cheaper than the HBM traffic it
  added. Recomputing on the gathered rows keeps both: tiny residuals AND
  the small backward.

Exactness: identical to the dense autodiff path up to f32 summation order,
EXCEPT on exact max ties: ``jnp.max``'s VJP splits the cotangent evenly
across tied rows, while this path follows the FIRST argmax row (the argmax
convention of the reference's CUDA/TF pooling ops). Ties at distinct points
are measure-zero on continuous clouds; the all-tied degenerate case (a dead
ReLU channel, every row 0) gets zero gradient on BOTH paths because the
ReLU mask kills it. See PARITY.md (deviation ledger) and
tests/test_sparse_encode.py.

Inference-mode BatchNorm is an affine map, so its backward is the
channelwise constant ``gamma * rsqrt(var + eps)`` — no statistics enter the
gradient (the attack always runs BN on frozen moving stats).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Library routing for the attack path; AttackRunner consults
# ``sparse_enabled()``. None = auto: sparse on TPU, dense elsewhere — the
# golden pack pins CPU attack artifacts bit-wise and the sparse backward's
# f32 summation order differs from dense autodiff, so (like the Pallas
# kernel routing in ops/chamfer.py) CPU keeps the reference-bit path.
# True/False force it either way (cli/run_attack.py --encoder_vjp).
SPARSE_ENCODER_VJP: bool | None = None


def sparse_enabled() -> bool:
    if SPARSE_ENCODER_VJP is not None:
        return bool(SPARSE_ENCODER_VJP)
    return jax.default_backend() == "tpu"

# How the gathered [b, bneck, 3] gradient returns to point rows:
# "onehot" — a [b, bneck, n] 0/1 matrix contracted on the MXU (contraction
#   dim bneck=128 exactly fills the systolic array; deterministic
#   first-axis summation order for duplicate rows);
# "scatter" — jnp scatter-add (TPU scatter is serialized; kept as the A/B
#   alternative).
SCATTER_IMPL = "onehot"

_BN_EPS = 1e-5  # flax.linen.BatchNorm default (attack BN is inference-mode)


def _encoder_method(mdl, x, train):
    return mdl.encoder(x, train=train)


def encoder_layer_tables(variables):
    """Per-layer (kernel [c_in, c_out], channelwise backward scale | None).

    The backward scale folds inference-BN's affine slope
    ``gamma * rsqrt(moving_var + eps)``; layers without BN get None.
    """
    params = variables["params"]["encoder"]
    stats = variables.get("batch_stats", {}).get("encoder", {})
    n_layers = len([k for k in params if k.startswith("conv_")])
    kernels, scales = [], []
    for i in range(n_layers):
        kernels.append(params[f"conv_{i}"]["kernel"])
        if f"bn_{i}" in params:
            gamma = params[f"bn_{i}"]["scale"]
            var = stats[f"bn_{i}"]["var"]
            scales.append(
                gamma.astype(jnp.float32)
                * jax.lax.rsqrt(var.astype(jnp.float32) + _BN_EPS)
            )
        else:
            scales.append(None)
    return kernels, scales


def make_sparse_encode(model, variables):
    """Build ``encode(x) -> z`` with the argmax-sparse backward.

    ``model`` must be a PointNetAE-style module whose ``encoder`` submodule
    is a Dense->[BN]->ReLU stack named ``conv_i``/``bn_i`` (models/layers.py
    PointMLP). The forward is the unmodified flax apply, so ``z`` is
    bit-identical to ``model.encode``.
    """
    kernels, scales = encoder_layer_tables(variables)
    n_layers = len(kernels)

    def run_pre(x):
        # per-point pre-pool feature map [..., n, bneck]; train=False:
        # frozen moving stats, the attack contract
        return model.apply(variables, x, False, method=_encoder_method)

    def gathered_masks(x, idx):
        # Re-run the per-point encoder on ONLY the argmax rows to recover
        # their ReLU masks: a per-point MLP is row-independent (Dense is a
        # per-row dot, inference-BN a per-channel affine), so row r of the
        # gathered forward reproduces original row idx[r]'s bits exactly.
        xg = jnp.take_along_axis(x, idx[..., :, None], axis=-2)
        _, mods = model.apply(
            variables,
            xg,
            False,
            method=_encoder_method,
            capture_intermediates=True,
        )
        inter = mods["intermediates"]["encoder"]
        # ReLU input per layer: the BN output where BN exists, else the
        # Dense output (use_bn=False encoder variants).
        return tuple(
            inter[f"bn_{i}" if f"bn_{i}" in inter else f"conv_{i}"][
                "__call__"
            ][0]
            > 0
            for i in range(n_layers)
        )

    @jax.custom_vjp
    def encode(x):
        return jnp.max(run_pre(x), axis=-2)

    def encode_fwd(x):
        pre = run_pre(x)
        z = jnp.max(pre, axis=-2)
        # FIRST max row per channel; XLA fuses this with the max reduction
        # (same operand, same pass) so pre is never fully materialized
        idx = jnp.argmax(pre, axis=-2)  # [..., bneck]
        return z, (x, idx)

    def encode_bwd(res, dz):
        x, idx = res
        masks = gathered_masks(x, idx)
        n = x.shape[-2]
        bneck = dz.shape[-1]
        # Seed: gathered row r carries channel r's cotangent only.
        g = dz.astype(jnp.float32)[..., None, :] * jnp.eye(
            bneck, dtype=jnp.float32
        )
        for layer in range(n_layers - 1, -1, -1):
            g = jnp.where(masks[layer], g, 0.0)
            if scales[layer] is not None:
                g = g * scales[layer]
            g = jnp.matmul(g, kernels[layer].astype(jnp.float32).T)
        # g is now [..., bneck, 3]: per-gathered-row input gradient.
        if SCATTER_IMPL == "onehot":
            onehot = (
                idx[..., :, None] == jnp.arange(n, dtype=idx.dtype)
            ).astype(jnp.float32)
            dx = jnp.einsum("...rn,...rk->...nk", onehot, g)
        else:
            lead = idx.shape[:-1]
            b = int(np_prod(lead)) if lead else 1
            idx2 = idx.reshape(b, bneck)
            g2 = g.reshape(b, bneck, g.shape[-1])
            dx = (
                jnp.zeros((b, n, g.shape[-1]), jnp.float32)
                .at[jnp.arange(b)[:, None], idx2]
                .add(g2)
                .reshape(lead + (n, g.shape[-1]))
            )
        return (dx.astype(x.dtype),)

    encode.defvjp(encode_fwd, encode_bwd)
    return encode


def np_prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out
