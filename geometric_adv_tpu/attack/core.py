"""The adversarial attack as one device-side program.

What the reference does (reference: src/adv_ae.py:191-251): per batch of 10
source/target pairs, per dist_weight, re-init a perturbation variable, run
500 Adam steps on ``loss_adv + dist_weight * loss_dist`` w.r.t. the
perturbation only (the victim AE is frozen), and after iteration 400 keep the
per-example best output by target reconstruction error. Each iteration costs
2-4 Python<->GPU round trips — ~9.75M session calls for the full 19,500-pair
grid.

TPU re-design: the whole optimization is a single ``lax.scan`` jitted once:

- the scan carries (pert, Adam m/v, per-example best-so-far);
- one scan step = forward + VJP of the frozen AE w.r.t. pert + TF-flavored
  Adam update + a masked best-update — no host involvement;
- metrics recorded at step t are the post-update values of reference
  iteration t: the forward that computes them is the same forward that
  produces step t's gradient, so tracking costs nothing extra;
- ``dist_weight_list`` is vmapped (the reference loops it sequentially,
  re-running the whole attack per weight);
- the pair-grid batch axis is sharded over the device mesh with
  ``jax.sharding`` — the 19,500 independent optimizations are
  embarrassingly parallel.

Semantic parity notes:
- Adam here replicates tf.train.AdamOptimizer's update exactly (bias
  correction folded into lr_t, eps added outside the sqrt):
  reference attack lr 0.01 (attacker/run_attack.py:28).
- best-update rule is strict ``<`` on target recon error, from iteration
  ``num_iterations_thresh`` onward (reference: src/adv_ae.py:234-246).
- pert init: truncated normal, stddev 1e-7, seed 55
  (reference: src/adversary.py:27-28).
- BN runs in inference mode with frozen moving stats — the reference's
  b_norm_decay=1.0 trick (attacker/run_attack.py:88-90).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from geometric_adv_tpu.models.pointnet_ae import PointNetAE
from geometric_adv_tpu.ops import chamfer_loss_per_pc, nn_distance
from geometric_adv_tpu.ops.chamfer import chamfer_frozen_payloads
from geometric_adv_tpu.ops.emd import emd_loss_fused
from geometric_adv_tpu.parallel.distributed import (
    gather_global,
    make_global_replicated,
    shard_host_batch,
)
from geometric_adv_tpu.parallel.mesh import (
    pad_to_multiple,
    replicated,
)

Array = jax.Array

# A/B switch: merge the attack's two chamfer evaluations into one batched
# kernel call. Default False (measured slower; see make_attack_loss).
BATCH_THE_TWO_CHAMFERS = False

# One-shot runtime A/B of the fused chamfer-loss kernel vs the composed
# nn_distance path, run by AttackRunner.__init__ on TPU. The two
# implementations' relative speed INVERTS with chip/toolchain state (fused
# won round 2's sessions by 4-5%; composed won every round-3 session by
# 32-112% — DESIGN.md round-3 table), so a static default is wrong for
# somebody every session; the only reliable router is the live chip.
# CLIs set this False when --chamfer_impl forces an implementation, and
# bench.py sets it False around its own explicit fused/composed arms.
CALIBRATE_CHAMFER_IMPL = True
_CALIB_BATCH = 64
_CALIB_ITERS = 8
_CALIB_REPS = 3
# decision cache: one measurement per (shape, loss-config) per process
_CHAMFER_CALIB_CACHE: dict[tuple, bool] = {}


class AttackOutputs(NamedTuple):
    """Mirrors the reference's per-class attack artifacts
    (reference: attacker/run_attack.py:141-144, src/adv_ae.py:249)."""

    metrics: Array  # [W, B, 5]: loss_adv, loss_dist, S-CD, T-NRE, T-RE
    pc_input: Array  # [W, B, n, 3] adversarial inputs
    pc_recon: Array  # [W, B, m, 3] their reconstructions


def pert_losses(pert: Array) -> tuple[Array, Array]:
    """(L2 norm of the full perturbation, max per-point norm) per example.

    reference: src/adversary.py:39-57.
    """
    per_point_sq = jnp.sum(pert * pert, axis=-1)
    pert_norm = jnp.sqrt(jnp.sum(per_point_sq, axis=-1))
    max_norm = jnp.sqrt(jnp.max(per_point_sq, axis=-1))
    return pert_norm, max_norm


def _tf_adam_update(g, m, v, t, lr, b1=0.9, b2=0.999, eps=1e-8):
    """tf.train.AdamOptimizer's exact update rule."""
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    lr_t = lr * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
    step = lr_t * m / (jnp.sqrt(v) + eps)
    return step, m, v


def init_pert(shape, stddev=1e-7, seed=55) -> Array:
    """reference: src/adversary.py:27-28 (truncated normal, |x| < 2 sigma)."""
    key = jax.random.PRNGKey(seed)
    return (
        jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)
        * stddev
    )


def make_attack_loss(
    encode: Callable[[Array], Array],
    decode: Callable[[Array], Array],
    loss_adv_type: str,
    loss_dist_type: str,
    ae_loss_type: str,
    max_point_pert_weight: float,
    max_point_dist_weight: float,
    chamfer_method: str = "auto",
):
    """Build the attack's (total_loss, metrics) function of the perturbation.

    ``chamfer_method`` ("auto" | "fused" | "composed") binds the chamfer
    fused-vs-composed routing into the traced program (ops/chamfer.py::
    chamfer_loss_per_pc) — AttackRunner passes its per-runner calibration
    decision here so two runners in one process route independently.

    reference: src/adv_ae.py:78-142.
    """

    def ae_loss_per_pc(recon, gt):
        if ae_loss_type == "chamfer":
            # fused loss+grad-payload kernel on TPU (ops/chamfer.py)
            return chamfer_loss_per_pc(recon, gt, method=chamfer_method)
        # EMD variant via the fused sweep (differentiable cost)
        return emd_loss_fused(recon, gt)

    def forward(pert, x, target_z, gt, dist_weight):
        adv = x + pert
        z = encode(adv)
        recon = decode(z)

        if (
            BATCH_THE_TWO_CHAMFERS
            and ae_loss_type == "chamfer"
            and max_point_dist_weight == 0.0
            and recon.shape == adv.shape
            and gt.shape == x.shape
        ):
            # one batched fused chamfer for both the target recon error and
            # the adv-to-source distance (A/B'd OFF by default: measured 25%
            # SLOWER than two separate calls at [256, 1024] — the merged
            # kernel serializes the whole distance pass before the encoder
            # backward can start, losing pipelining against it)
            both = chamfer_loss_per_pc(
                jnp.concatenate([recon, adv], axis=0),
                jnp.concatenate([gt, x], axis=0),
                method=chamfer_method,
            )
            t_re, input_dist_per_pc = jnp.split(both, 2, axis=0)
            max_dist_per_pc = input_dist_per_pc  # unused (weight 0)
        elif ae_loss_type == "chamfer" and max_point_dist_weight == 0.0:
            t_re = chamfer_loss_per_pc(recon, gt, method=chamfer_method)
            input_dist_per_pc = chamfer_loss_per_pc(
                adv, x, method=chamfer_method
            )
            max_dist_per_pc = input_dist_per_pc  # unused (weight 0)
        elif ae_loss_type == "chamfer":
            t_re = ae_loss_per_pc(recon, gt)
            # the max-point term needs the per-point d1 vector
            d1, _, d2, _ = nn_distance(adv, x)
            input_dist_per_pc = (
                jnp.mean(d1, axis=-1) + jnp.mean(d2, axis=-1)
            )
            max_dist_per_pc = jnp.max(d1, axis=-1)
        else:
            t_re = ae_loss_per_pc(recon, gt)
            # reference selects the input-dist formulation by the victim's
            # loss type (src/adv_ae.py:129-142); its EMD branch is
            # non-functional (rank-1 reduce_mean(axis=1) on match_cost's [b]
            # output — SURVEY §2.2), so the repaired semantics here use the
            # per-example EMD cost for both the distance and its max proxy.
            input_dist_per_pc = emd_loss_fused(adv, x)
            max_dist_per_pc = input_dist_per_pc

        loss_pert, loss_max = pert_losses(pert)

        if loss_adv_type == "latent":
            diff = z - target_z
            loss_adv = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        else:
            loss_adv = t_re

        if loss_dist_type == "pert":
            loss_dist = loss_pert
            if max_point_pert_weight > 0.0:
                loss_dist = loss_dist + max_point_pert_weight * loss_max
        else:
            loss_dist = input_dist_per_pc
            if max_point_dist_weight > 0.0:
                loss_dist = loss_dist + max_point_dist_weight * max_dist_per_pc

        total = jnp.sum(loss_adv + dist_weight * loss_dist)
        aux = {
            "loss_adv": loss_adv,
            "loss_dist": loss_dist,
            "source_chamfer": input_dist_per_pc,
            "t_re": t_re,
            "adv": adv,
            "recon": recon,
        }
        return total, aux

    return forward


def _frozen_chamfer_terms(x1: Array, p: dict, m: int):
    """Frozen-assignment chamfer pieces from carried payloads.

    Returns (d1 [..., n] per-point squared NN dists of x1's points,
    mean_d2 [...] the x2-side mean) — both pure elementwise in x1, with the
    NN assignments frozen at the refresh state ``p`` (see
    ops/chamfer.py::chamfer_frozen_payloads for the algebra; the d2 side
    uses the difference-correction form to avoid f32 cancellation).
    Autodiff w.r.t. x1 reproduces the reference scatter-add backward for
    the frozen assignments exactly.
    """
    diff = x1 - p["nn1"]
    d1 = jnp.sum(diff * diff, axis=-1)
    delta = x1 - p["x1_0"]
    corr = -2.0 * jnp.sum(delta * p["r"], axis=(-1, -2)) + jnp.sum(
        p["cnt"] * jnp.sum(delta * delta, axis=-1), axis=-1
    )
    return d1, (p["d2sum0"] + corr) / m


def make_frozen_attack_loss(
    encode: Callable[[Array], Array],
    decode: Callable[[Array], Array],
    loss_adv_type: str,
    loss_dist_type: str,
    max_point_pert_weight: float,
    max_point_dist_weight: float,
):
    """Frozen-assignment variant of ``make_attack_loss`` — the
    ``chamfer_refresh`` fast mode's per-iteration program.

    Identical loss/metric structure to the exact forward, with both chamfer
    evaluations replaced by elementwise frozen-payload forms (payloads are
    recomputed exactly every ``chamfer_refresh`` iterations by
    ``attack_batch``; at a refresh step the values and gradients equal the
    exact path's). Chamfer AE loss only — ``attack_batch`` gates.
    """

    def forward(pert, x, target_z, gt, dist_weight, payloads):
        p_recon, p_adv = payloads
        adv = x + pert
        z = encode(adv)
        recon = decode(z)

        d1r, mean_d2r = _frozen_chamfer_terms(recon, p_recon, gt.shape[-2])
        t_re = jnp.mean(d1r, axis=-1) + mean_d2r
        d1a, mean_d2a = _frozen_chamfer_terms(adv, p_adv, x.shape[-2])
        input_dist_per_pc = jnp.mean(d1a, axis=-1) + mean_d2a
        max_dist_per_pc = jnp.max(d1a, axis=-1)

        loss_pert, loss_max = pert_losses(pert)

        if loss_adv_type == "latent":
            diff = z - target_z
            loss_adv = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        else:
            loss_adv = t_re

        if loss_dist_type == "pert":
            loss_dist = loss_pert
            if max_point_pert_weight > 0.0:
                loss_dist = loss_dist + max_point_pert_weight * loss_max
        else:
            loss_dist = input_dist_per_pc
            if max_point_dist_weight > 0.0:
                loss_dist = loss_dist + max_point_dist_weight * max_dist_per_pc

        total = jnp.sum(loss_adv + dist_weight * loss_dist)
        aux = {
            "loss_adv": loss_adv,
            "loss_dist": loss_dist,
            "source_chamfer": input_dist_per_pc,
            "t_re": t_re,
            "adv": adv,
            "recon": recon,
        }
        return total, aux

    return forward


def make_attack_payload_fn(
    encode: Callable[[Array], Array],
    decode: Callable[[Array], Array],
    payload_method: str = "auto",
):
    """Build the refresh step of the ``chamfer_refresh`` fast mode: one
    exact fused-payload pass per attack chamfer (recon-vs-gt, adv-vs-source)
    at the current perturbation. Output is the payload pytree the frozen
    forward consumes; stop_gradient'd (payloads are constants of the
    frozen evaluation — chamfer's true gradient treats the argmin as
    locally constant anyway)."""

    def payload_fn(pert, x, gt):
        adv = x + pert
        recon = decode(encode(adv))

        def pack(x1, x2):
            d1, d2, nn1, snn1, cnt1 = chamfer_frozen_payloads(
                x1, x2, payload_method
            )
            del d1  # the frozen d1 form recomputes it exactly
            return {
                "nn1": nn1,
                "r": snn1 - cnt1[..., None] * x1,
                "cnt": cnt1,
                "d2sum0": jnp.sum(d2, axis=-1),
                "x1_0": x1,
            }

        return jax.lax.stop_gradient(
            (pack(recon, gt), pack(adv, x))
        )

    return payload_fn


def attack_batch(
    encode: Callable[[Array], Array],
    decode: Callable[[Array], Array],
    source_pc: Array,  # [B, n, 3]
    target_latent: Array,  # [B, z]
    target_pc: Array,  # [B, m, 3]
    target_ae_loss_ref: Array,  # [B]
    dist_weights: Array,  # [W]
    *,
    num_iterations: int = 500,
    num_iterations_thresh: int = 400,
    learning_rate: float = 0.01,
    loss_adv_type: str = "chamfer",
    loss_dist_type: str = "chamfer",
    ae_loss_type: str = "chamfer",
    max_point_pert_weight: float = 0.0,
    max_point_dist_weight: float = 0.0,
    pert_seed: int = 55,
    track_by: str = "t_re",
    chamfer_method: str = "auto",
    chamfer_refresh: int = 0,
) -> AttackOutputs:
    """Run the full attack for one batch of pairs, all dist_weights at once.

    Pure jittable function: call under jit (AttackRunner does) with the batch
    axis sharded over the mesh. ``dist_weights`` may be [W] (scalar weight
    per run, the standard attack) or [W, B] (per-example weights, used by
    the binary-search variant). ``track_by`` selects the best-so-far key:
    "t_re" (reference: src/adv_ae.py:239, the main attack) or "loss_dist"
    (reference: src/adv_ae.py:283-290, the binary-search variant).

    ``chamfer_refresh`` > 0 enables the frozen-assignment fast mode (chamfer
    AE loss only): NN assignments for both attack chamfers are recomputed
    exactly every ``chamfer_refresh`` iterations (one fused payload pass,
    ops/pallas/chamfer_loss_kernel.py) and held frozen in between, where the
    loss/gradient are pure elementwise — exploiting that ``adv = x + pert``
    moves slowly and ``x``/``gt`` are constant across the 500-step scan.
    ``chamfer_refresh=1`` refreshes every step (matches the exact path up to
    f32 association); 0 disables (exact, the parity default). Documented
    deviation: between refreshes the recorded metrics and the best-so-far
    selection see the frozen (majorizing) chamfer values — PARITY.md #13.
    """
    b, n, _ = source_pc.shape
    m = target_pc.shape[1]
    use_frozen = chamfer_refresh and chamfer_refresh > 0
    if use_frozen and ae_loss_type != "chamfer":
        raise ValueError(
            "chamfer_refresh fast mode requires the chamfer AE loss"
        )
    forward = make_attack_loss(
        encode, decode, loss_adv_type, loss_dist_type, ae_loss_type,
        max_point_pert_weight, max_point_dist_weight,
        chamfer_method=chamfer_method,
    )
    if use_frozen:
        frozen_forward = make_frozen_attack_loss(
            encode, decode, loss_adv_type, loss_dist_type,
            max_point_pert_weight, max_point_dist_weight,
        )
        payload_fn = make_attack_payload_fn(encode, decode)
    thresh = max(num_iterations_thresh, 1)

    def run_one_weight(dist_weight):
        grad_fn = jax.value_and_grad(forward, has_aux=True)

        def track_and_update(carry, t, aux, grads):
            pert, m_acc, v_acc, best = carry

            # Record the post-update metrics of reference iteration t
            # (this forward IS that iteration's metric read).
            record = t >= thresh
            key = aux[track_by]
            better = record & (key < best["t_re"])  # strict <
            sel = lambda new, old: jnp.where(  # noqa: E731
                better.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
            )
            t_nre = aux["t_re"] / target_ae_loss_ref
            new_best = {
                "t_re": sel(key, best["t_re"]),
                "metrics": sel(
                    jnp.stack(
                        [aux["loss_adv"], aux["loss_dist"],
                         aux["source_chamfer"], t_nre], axis=-1,
                    ),
                    best["metrics"],
                ),
                "adv": sel(aux["adv"], best["adv"]),
                "recon": sel(aux["recon"], best["recon"]),
            }

            step, m_new, v_new = _tf_adam_update(
                grads, m_acc, v_acc, (t + 1).astype(jnp.float32),
                learning_rate,
            )
            return (pert - step, m_new, v_new, new_best)

        def scan_step(carry, t):
            (_, aux), grads = grad_fn(
                carry[0], source_pc, target_latent, target_pc, dist_weight
            )
            return track_and_update(carry, t, aux, grads), None

        pert0 = init_pert((b, n, 3), seed=pert_seed)
        best0 = {
            "t_re": jnp.full((b,), 1e10, jnp.float32),
            "metrics": jnp.zeros((b, 4), jnp.float32),
            "adv": jnp.zeros((b, n, 3), jnp.float32),
            "recon": jnp.zeros((b, m, 3), jnp.float32),
        }
        carry0 = (pert0, jnp.zeros_like(pert0), jnp.zeros_like(pert0), best0)
        # steps t = 0..num_iterations: step t records the state after t Adam
        # updates (reference iterations 1..num_iterations; t=0 is pre-update
        # and never recorded since thresh >= 1).
        if not use_frozen:
            (_, _, _, best), _ = jax.lax.scan(
                scan_step, carry0, jnp.arange(num_iterations + 1)
            )
        else:
            frozen_grad_fn = jax.value_and_grad(frozen_forward, has_aux=True)

            def run_chunk(carry, t0, length):
                # refresh: exact payload pass at the chunk's entry pert, so
                # the chunk's FIRST step evaluates with delta == 0 (values
                # and gradient equal the exact path's at that step)
                payloads = payload_fn(carry[0], source_pc, target_pc)

                def frozen_step(c, t):
                    (_, aux), grads = frozen_grad_fn(
                        c[0], source_pc, target_latent, target_pc,
                        dist_weight, payloads,
                    )
                    return track_and_update(c, t, aux, grads), None

                carry, _ = jax.lax.scan(
                    frozen_step, carry, t0 + jnp.arange(length)
                )
                return carry

            total = num_iterations + 1
            n_full, rem = divmod(total, chamfer_refresh)
            carry = carry0
            if n_full:
                carry, _ = jax.lax.scan(
                    lambda c, t0: (run_chunk(c, t0, chamfer_refresh), None),
                    carry,
                    jnp.arange(n_full) * chamfer_refresh,
                )
            if rem:
                carry = run_chunk(
                    carry, jnp.int32(n_full * chamfer_refresh), rem
                )
            best = carry[3]
        metrics = jnp.concatenate(
            [best["metrics"], best["t_re"][:, None]], axis=-1
        )
        return AttackOutputs(metrics, best["adv"], best["recon"])

    return jax.vmap(run_one_weight)(jnp.asarray(dist_weights, jnp.float32))


def _auto_dispatch_batch(n_pts: int, n_examples: int | None = None) -> int:
    """The per-dispatch pair batch AttackRunner.attack auto-sizes to: the
    scanned fwd+bwd working set stays within the proven envelope
    (1500 pairs x 2048 points crashed a v5e worker; 500 x 2048 and
    256 x 1024 are production-proven)."""
    max_point_rows = 1_024_000  # exactly 500 pairs at 2048 pts
    batch = max(1, max_point_rows // n_pts)
    if n_examples is not None:
        batch = min(batch, n_examples)
    return batch


def _calibrate_chamfer_impl(
    encode, decode, conf, victim_sig=(), calib_batch=None
) -> bool:
    """Measure both chamfer-loss implementations inside a real attack step
    on the live device and return True if the fused kernel wins.

    The calibration program is the attack's own gradient step (AE forward +
    VJP w.r.t. the perturbation + both chamfer losses) scanned a few
    iterations — NOT the kernels in isolation: round 3 measured the fused
    kernel itself at full VPU rate in the same session where the fused
    ATTACK lagged 46%, i.e. the difference lives in scheduling/pipelining
    against the encoder backward, which only the composite step exposes.

    ``calib_batch`` sizes the proxy workload. It MUST be the runner's real
    dispatch batch: round 4 calibrated at a fixed batch 64 and recorded a
    session where that proxy mis-ranked fused over composed at 2048 pts
    while the production-batch workload favored composed by ~2x (VERDICT r4
    #3) — the scheduling effect the calibration exists to capture is
    batch-size dependent. AttackRunner passes its production dispatch batch
    (``_auto_dispatch_batch`` or the caller's explicit batch).

    ``victim_sig`` extends the cache key with the victim's identity (the
    caller passes the param-tree shape/dtype signature): the measured gap
    lives in scheduling against the ENCODER backward, so a decision made
    against one victim must not be reused for a structurally different one.
    Decisions are cached per (victim, shape, loss config) for the process
    lifetime; each arm is bound explicitly via ``chamfer_method`` — no
    process globals are read or written.
    """
    import time

    if calib_batch is None:
        calib_batch = _CALIB_BATCH

    n = conf.n_input[0]
    m = conf.resolved_n_output()[0]
    # max_point_*_weight are in the key because they change which branch of
    # make_attack_loss traces (max_point_dist_weight > 0 routes nn_distance
    # per-point instead of chamfer_loss_per_pc) — a decision measured on one
    # program structure must not be reused for the other (ADVICE r4).
    key = (
        victim_sig, n, m, conf.loss_adv_type, conf.loss_dist_type, conf.loss,
        conf.max_point_pert_weight, conf.max_point_dist_weight,
        getattr(conf, "ae_dtype", "float32"),
        calib_batch,
    )
    if key in _CHAMFER_CALIB_CACHE:
        return _CHAMFER_CALIB_CACHE[key]

    b = calib_batch
    rng = np.random.RandomState(123)
    x = jnp.asarray(rng.rand(b, n, 3).astype(np.float32) - 0.5)
    # gt is n-sized like production's target_pc (attack pairs are dataset
    # clouds — pipeline.py::prepare_data_for_attack), so the measured
    # recon-vs-gt chamfer runs at production's [m_out, n] shape.
    gt = jnp.asarray(rng.rand(b, n, 3).astype(np.float32) - 0.5)
    tz = jax.jit(encode)(gt)
    pert0 = init_pert((b, n, 3))

    def build_and_warm(fused):
        forward = make_attack_loss(
            encode, decode, conf.loss_adv_type, conf.loss_dist_type,
            conf.loss, conf.max_point_pert_weight,
            conf.max_point_dist_weight,
            chamfer_method="fused" if fused else "composed",
        )
        grad_fn = jax.grad(lambda *a: forward(*a)[0])

        @jax.jit
        def run(p0):
            def step(p, _):
                g = grad_fn(p, x, tz, gt, jnp.float32(1.0))
                return p - 0.01 * g, None

            p, _ = jax.lax.scan(step, p0, None, length=_CALIB_ITERS)
            return jnp.sum(p)

        float(run(pert0))  # compile + warmup (inputs never timed)
        return run

    runs = {True: build_and_warm(True), False: build_and_warm(False)}
    rates: dict[bool, list[float]] = {True: [], False: []}
    for rep in range(_CALIB_REPS):
        for fused in (True, False):
            # fresh inputs per rep: the axon relay caches identical
            # (executable, inputs) executions; a readback ends the region
            p = pert0 + np.float32(1e-6 * (rep + 1) + (5e-7 if fused else 0))
            t0 = time.time()
            float(runs[fused](p))
            rates[fused].append(b * _CALIB_ITERS / (time.time() - t0))
    fused_rate = float(np.median(rates[True]))
    composed_rate = float(np.median(rates[False]))
    winner = fused_rate >= composed_rate
    print(
        f"chamfer-impl calibration @[{b}, {n}x{m}]: "
        f"fused {fused_rate:.0f} vs composed {composed_rate:.0f} "
        f"pair-iters/s -> {'fused' if winner else 'composed'}"
    )
    _CHAMFER_CALIB_CACHE[key] = winner
    return winner


class AttackRunner:
    """Host-side driver: frozen victim AE + jitted sharded attack program.

    Replaces ``AdvAE`` + ``Adversary`` (reference: src/adv_ae.py:25-304,
    src/adversary.py:9-57).
    """

    def __init__(
        self,
        model: PointNetAE,
        params,
        batch_stats,
        conf,
        mesh=None,
        chamfer_impl: str = "auto",
        batch_size: int | None = None,
    ):
        self.model = model
        self.conf = conf
        self.mesh = mesh
        self.batch_size = batch_size
        # frozen-assignment fast mode period (0 = exact; conf-driven so the
        # CLI/pipeline can enable it per stage — see attack_batch docstring)
        self.chamfer_refresh = int(
            getattr(conf, "chamfer_refresh", 0) or 0
        )
        if self.chamfer_refresh and conf.loss != "chamfer":
            raise ValueError(
                "chamfer_refresh fast mode requires the chamfer AE loss"
            )
        variables = {"params": params, "batch_stats": batch_stats}
        if mesh is not None:
            if jax.process_count() == 1:
                variables = jax.device_put(variables, replicated(mesh))
            else:
                variables = jax.tree.map(
                    lambda a: make_global_replicated(jax.device_get(a), mesh),
                    variables,
                )
        self._variables = variables

        from geometric_adv_tpu.models import sparse_encode as _se

        if _se.sparse_enabled() and isinstance(model, PointNetAE):
            # argmax-sparse input-gradient: the frozen encoder's backward
            # runs on the <= bneck gathered argmax rows instead of all n
            # point rows (models/sparse_encode.py) — z is bit-identical,
            # the gradient matches dense autodiff up to f32 summation order
            # (first-argmax on exact max ties; see PARITY.md)
            _sparse = _se.make_sparse_encode(model, variables)

            def encode(x):
                # losses/metrics stay f32 even when the AE computes in bf16
                return _sparse(x).astype(jnp.float32)
        else:

            def encode(x):
                return model.apply(
                    variables, x, train=False, method=PointNetAE.encode
                ).astype(jnp.float32)

        def decode(z):
            return model.apply(
                variables, z, train=False, method=PointNetAE.decode
            ).astype(jnp.float32)

        import geometric_adv_tpu.ops.chamfer as _chamfer_mod

        if self.chamfer_refresh:
            # frozen fast mode: the per-step program has no full chamfer
            # call to route — refresh payloads go through the fused payload
            # kernel (TPU) / composed fallback via chamfer_frozen_payloads'
            # own auto-routing, so fused/composed calibration is moot
            self.chamfer_method = "auto"
        elif chamfer_impl in ("fused", "composed"):
            # explicit forcing (CLI --chamfer_impl / bench arms): bind it,
            # skip calibration
            self.chamfer_method = chamfer_impl
        elif (
            CALIBRATE_CHAMFER_IMPL
            and jax.process_count() == 1
            and _chamfer_mod._on_tpu()
            and conf.loss == "chamfer"
            and _chamfer_mod._fused_loss_shape_ok(conf.n_input[0])
        ):
            # self-calibrating routing (VERDICT r3 #1-weak): the static
            # fused-for-n<=1024 default silently cost pipeline users up to
            # ~2x in composed-favoring sessions; measure both on the live
            # chip once and route the winner. The decision is bound to THIS
            # runner's traced program (chamfer_method below) rather than a
            # process global, so later runners with other shapes/victims
            # cannot flip it retroactively; the gate is shape-only so an
            # earlier composed decision (or FUSED_LOSS_ENABLED=False from
            # an unrelated caller) never disables a later calibration.
            # The victim's param-tree signature keys the cache: the measured
            # effect is scheduling against the encoder backward, so the
            # decision must not be reused across different architectures.
            # Multi-host gate (jax.process_count() above): each process
            # would time the A/B independently and near-ties could trace
            # DIFFERENT attack programs across hosts — an SPMD mismatch
            # that hangs the sharded attack (ADVICE r4). Multi-host runs
            # use the static auto default or an explicit --chamfer_impl.
            victim_sig = tuple(
                (tuple(leaf.shape), str(leaf.dtype))
                for leaf in jax.tree.leaves(params)
            )
            self.chamfer_method = (
                "fused"
                if _calibrate_chamfer_impl(
                    encode, decode, conf, victim_sig,
                    calib_batch=batch_size
                    or _auto_dispatch_batch(conf.n_input[0]),
                )
                else "composed"
            )
        else:
            self.chamfer_method = "auto"

        self._attack_fn = jax.jit(
            partial(
                attack_batch,
                encode,
                decode,
                num_iterations=conf.num_iterations,
                num_iterations_thresh=conf.num_iterations_thresh,
                learning_rate=conf.learning_rate,
                loss_adv_type=conf.loss_adv_type,
                loss_dist_type=conf.loss_dist_type,
                ae_loss_type=conf.loss,
                max_point_pert_weight=conf.max_point_pert_weight,
                max_point_dist_weight=conf.max_point_dist_weight,
                chamfer_method=self.chamfer_method,
                chamfer_refresh=self.chamfer_refresh,
            )
        )

    @property
    def attack_mode(self) -> str:
        """Routing record for artifacts/bench: which chamfer program this
        runner traced ("fused"/"composed"/"auto", or "frozen-<T>" for the
        chamfer_refresh fast mode)."""
        if self.chamfer_refresh:
            return f"frozen-{self.chamfer_refresh}"
        return self.chamfer_method

    def attack(
        self,
        source_pc,
        target_latent,
        target_pc,
        target_ae_loss_ref,
        batch_size: int | None = None,
        log_file=None,
    ):
        """Attack a grid of pairs; returns (metrics [W,N,5], adv [W,N,n,3],
        recon [W,N,m,3]) — the reference's artifact layout
        (reference: src/adv_ae.py:155-189).

        ``batch_size=None`` auto-sizes the per-dispatch pair batch so the
        scanned fwd+bwd working set stays within the proven envelope
        (1500 pairs x 2048 points crashed a v5e worker; 500 x 2048 and
        256 x 1024 are production-proven)."""
        import time

        n_examples = len(source_pc)
        if not batch_size:
            batch_size = self.batch_size or _auto_dispatch_batch(
                source_pc.shape[-2], n_examples
            )
        dist_weights = np.asarray(self.conf.dist_weight_list, np.float32)

        shard_of = 1 if self.mesh is None else self.mesh.devices.size
        outs = []
        for s in range(0, n_examples, batch_size):
            t0 = time.time()
            sl = slice(s, min(s + batch_size, n_examples))
            xs, n_orig = pad_to_multiple(
                np.asarray(source_pc[sl], np.float32), shard_of
            )
            zs, _ = pad_to_multiple(
                np.asarray(target_latent[sl], np.float32), shard_of
            )
            ts, _ = pad_to_multiple(
                np.asarray(target_pc[sl], np.float32), shard_of
            )
            rs, _ = pad_to_multiple(
                np.asarray(target_ae_loss_ref[sl], np.float32), shard_of
            )
            if self.mesh is not None:
                xs, zs, ts, rs = (
                    shard_host_batch(a, self.mesh) for a in (xs, zs, ts, rs)
                )
            out = self._attack_fn(xs, zs, ts, rs, dist_weights)
            mets, pcin, pcre = gather_global(
                (out.metrics, out.pc_input, out.pc_recon)
            )
            outs.append(
                AttackOutputs(
                    mets[:, :n_orig], pcin[:, :n_orig], pcre[:, :n_orig]
                )
            )
            dur = time.time() - t0
            msg = (
                f"Attack pairs {s}-{s + n_orig} of {n_examples}: "
                f"{dur:.2f}s "
                f"({self.conf.num_iterations * n_orig * len(dist_weights) / dur:.0f} iter/s)"
            )
            print(msg)
            if log_file is not None:
                log_file.write(msg + "\n")

        return AttackOutputs(
            np.concatenate([o.metrics for o in outs], axis=1),
            np.concatenate([o.pc_input for o in outs], axis=1),
            np.concatenate([o.pc_recon for o in outs], axis=1),
        )


def binary_search_attack(
    encode: Callable[[Array], Array],
    decode: Callable[[Array], Array],
    source_pc: Array,
    target_latent: Array,
    target_pc: Array,
    *,
    init_dist_weight: float = 10.0,
    upper_bound_dist_weight: float = 100.0,
    binary_search_step: int = 10,
    num_iterations: int = 500,
    learning_rate: float = 0.01,
    loss_adv_type: str = "chamfer",
    loss_dist_type: str = "chamfer",
    ae_loss_type: str = "chamfer",
    attack_fn: Callable | None = None,
):
    """Per-example binary search over the dist weight
    (reference: src/adv_ae.py:253-304, ``_attack_one_batch_binary_step``).

    Each outer step re-runs the full scanned attack with per-example weights,
    keeps the best (by loss_dist, strict <, recorded every iteration — the
    variant's rule) and bisects: a step that matches the global best counts
    as success and raises the lower bound, otherwise the upper bound drops
    (reference: src/adv_ae.py:292-302).

    Returns (out_best_adv_loss [B], out_best_dist [B], out_best_attack
    [B, n, 3], final dist_weight [B]).
    """
    b = len(source_pc)
    lower = np.zeros(b, np.float32)
    weight = np.full(b, init_dist_weight, np.float32)
    upper = np.full(b, upper_bound_dist_weight, np.float32)

    out_best_adv = np.full(b, 1e10, np.float32)
    out_best_dist = np.full(b, 1e10, np.float32)
    out_best_attack = np.ones_like(np.asarray(source_pc, np.float32))

    if attack_fn is None:
        attack_fn = partial(
            attack_batch,
            encode,
            decode,
            num_iterations=num_iterations,
            num_iterations_thresh=1,  # the variant records every iteration
            learning_rate=learning_rate,
            loss_adv_type=loss_adv_type,
            loss_dist_type=loss_dist_type,
            ae_loss_type=ae_loss_type,
            track_by="loss_dist",
        )
        attack_fn = jax.jit(attack_fn)

    ref = np.ones(b, np.float32)  # t_nre normalisation unused by this variant
    for _ in range(binary_search_step):
        out = attack_fn(
            np.asarray(source_pc, np.float32),
            np.asarray(target_latent, np.float32),
            np.asarray(target_pc, np.float32),
            ref,
            weight[None, :],
        )
        best_adv = np.asarray(out.metrics)[0, :, 0]  # loss_adv at best dist
        best_dist = np.asarray(out.metrics)[0, :, 1]
        best_pc = np.asarray(out.pc_input)[0]

        improved = best_dist < out_best_dist
        out_best_dist = np.where(improved, best_dist, out_best_dist)
        out_best_adv = np.where(improved, best_adv, out_best_adv)
        out_best_attack = np.where(
            improved[:, None, None], best_pc, out_best_attack
        )

        # success: this step's best matches the (updated) global best
        success = best_dist <= out_best_dist
        lower = np.where(success, np.maximum(lower, weight), lower)
        upper = np.where(~success, np.minimum(upper, weight), upper)
        weight = (lower + upper) / 2.0

    return out_best_adv, out_best_dist, out_best_attack, weight
