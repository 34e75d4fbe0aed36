"""On-device (TPU) verification of behaviors the CPU suite cannot see.

The pytest suite under ``tests/`` deliberately forces an 8-device CPU mesh
(tests/conftest.py), so TPU-only semantics — Mosaic compilation of the
Pallas kernels, the FTZ-sensitivity of the fused loss kernel's bitcast
int32 index lane, the TPU-default routing (fused loss kernel, argmax-sparse
encoder VJP) — are only exercised on real hardware. This CLI is the
permanent, reproducible form of those checks: run ``python -m
geometric_adv_tpu.cli.verify_tpu`` on a TPU host; it prints one PASS/FAIL
line per check and exits nonzero on any failure.

Checks:

1. backend is TPU;
2. Pallas v2 nn_distance == the jnp direct-difference composition (values
   AND argmin indices, bit-exact, including tie rows);
3. fused loss kernel payload indices i1/i2 == nn_distance indices exactly —
   the int32-in-f32 bitcast lane is biased by 2^23 so every stored pattern
   is a NORMAL f32 (round-2 ADVICE #3's FTZ hazard, fixed structurally);
   this asserts the whole biased-lane round trip on real Mosaic, which
   interpret-mode tests cannot;
4. fused vs composed chamfer loss: same values, same input gradients; and
   the backward kernel's split3_bf16 contraction == the exact-f32 one
   (guards against XLA/Mosaic eliding the in-kernel mantissa splits);
5. argmax-sparse encoder VJP (models/sparse_encode.py): forward
   bit-identical to the flax apply, input gradient == dense autodiff at f32
   matmul precision up to summation order;
6. short attack run: sparse-vs-dense encoder-VJP trajectories agree and the
   TPU auto-routing actually selects the sparse path;
7. AttackRunner's one-shot on-chip chamfer-impl calibration runs and routes
   the measured winner;
8. EMD: the fused sweep (``emd_loss_fused``, per-round distance recompute)
   matches the composed ``match_cost(approx_match(...))`` path in value AND
   gradient on real TPU arithmetic (the CPU suite only pins XLA:CPU);
9. frozen-payload chamfer (the ``chamfer_refresh`` fast mode's refresh op,
   PARITY #13): the fused payload-kernel route equals the composed
   scatter-add fallback on device, and the frozen elementwise forms
   reproduce the exact per-pc loss AND gradient at delta == 0;
10. the single-pass EMD sweep kernel (ops/pallas/emd_fused_kernel.py)
    equals the XLA sweep in value and both gradients on real Mosaic, and
    the TPU auto-routing gate admits it at an in-bounds shape;
11. metro's ``hausdorff_sampled`` at its 30,000-sample DEFAULT on device:
    the TPU branch feeds the v2 kernel a [1, 30k, 30k] problem (m_pad
    30080 — far beyond the shapes the rest of the suite exercises the
    tile-pick/VMEM budget at), cross-checked against the row-chunked
    reduction fallback evaluated on the same device (ADVICE r4).
"""

from __future__ import annotations

import sys

import numpy as np

_FAILURES: list[str] = []


def _check(name: str, ok: bool, detail: str = "") -> None:
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name}" + (f" — {detail}" if detail else ""), flush=True)
    if not ok:
        _FAILURES.append(name)


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = jax.default_backend() == "tpu"
    _check("backend is TPU", on_tpu, str(dev))
    if not on_tpu:
        print("not on TPU — remaining checks are meaningless here")
        sys.exit(1)

    import geometric_adv_tpu.models.sparse_encode as se
    import geometric_adv_tpu.ops.chamfer as chamfer_mod
    from geometric_adv_tpu.ops.chamfer import nn_distance, pairwise_sqdist
    from geometric_adv_tpu.ops.pallas.chamfer_loss_kernel import (
        chamfer_loss_payloads,
    )

    rng = np.random.RandomState(0)
    b, n, m = 4, 1000, 900  # non-multiples: exercises kernel padding
    x = jnp.asarray(rng.rand(b, n, 3).astype(np.float32) - 0.5)
    y = jnp.asarray(rng.rand(b, m, 3).astype(np.float32) - 0.5)
    # plant exact ties: clone a y point so two columns tie for some rows
    y = y.at[:, 1, :].set(y[:, 0, :])

    # --- 2: kernel vs jnp composition -----------------------------------
    d1k, i1k, d2k, i2k = jax.jit(nn_distance)(x, y)  # TPU routes the kernel

    @jax.jit
    def composed(x, y):
        sqd = pairwise_sqdist(x, y, method="direct")
        return (
            jnp.min(sqd, axis=-1),
            jnp.argmin(sqd, axis=-1).astype(jnp.int32),
            jnp.min(sqd, axis=-2),
            jnp.argmin(sqd, axis=-2).astype(jnp.int32),
        )

    d1c, i1c, d2c, i2c = composed(x, y)
    dd = max(
        float(jnp.max(jnp.abs(d1k - d1c))),
        float(jnp.max(jnp.abs(d2k - d2c))),
    )
    _check(
        "v2 kernel == jnp composition (values, 1e-8)",
        dd <= 1e-8,
        f"max|dd|={dd:.3g}",
    )
    _check(
        "v2 kernel == jnp composition (argmin indices, first-tie)",
        bool(
            jnp.array_equal(i1k, i1c) and jnp.array_equal(i2k, i2c)
        ),
        f"i1 mismatches={int(jnp.sum(i1k != i1c))}, "
        f"i2 mismatches={int(jnp.sum(i2k != i2c))}",
    )

    # --- 3: FTZ-sensitive index lane of the fused loss kernel ------------
    d1p, i1p, d2p, i2p, _nn1, _snn1, _cnt1 = jax.jit(chamfer_loss_payloads)(
        x, y
    )
    _check(
        "fused-kernel biased index lane (i1/i2 == nn_distance exactly)",
        bool(
            jnp.array_equal(i1p, i1k) and jnp.array_equal(i2p, i2k)
        ),
        f"i1 mismatches={int(jnp.sum(i1p != i1k))}, "
        f"i2 mismatches={int(jnp.sum(i2p != i2k))}",
    )
    _check(
        "fused-kernel distance lanes == nn_distance",
        bool(
            jnp.array_equal(d1p, d1k) and jnp.array_equal(d2p, d2k)
        ),
    )

    # --- 4: fused vs composed loss value + gradient ----------------------
    def loss_with(fused: bool, xx):
        prev = chamfer_mod.FUSED_LOSS_ENABLED
        chamfer_mod.FUSED_LOSS_ENABLED = fused
        try:
            fn = jax.jit(
                lambda a: jnp.sum(chamfer_mod.chamfer_loss_per_pc(a, y))
            )
            val = fn(xx)
            grad = jax.jit(
                jax.grad(
                    lambda a: jnp.sum(chamfer_mod.chamfer_loss_per_pc(a, y))
                )
            )(xx)
        finally:
            chamfer_mod.FUSED_LOSS_ENABLED = prev
        return np.asarray(val), np.asarray(grad)

    vf, gf = loss_with(True, x)
    vc, gc = loss_with(False, x)
    _check(
        "fused vs composed loss value",
        bool(np.max(np.abs(vf - vc)) <= 1e-6 * max(1.0, abs(float(vc)))),
        f"|dv|={float(np.max(np.abs(vf - vc))):.3g}",
    )
    gd = float(np.max(np.abs(gf - gc)))
    _check(
        "fused vs composed loss gradient",
        gd <= 1e-6,
        f"max|dg|={gd:.3g}",
    )

    # --- 4b: bwd kernel split3_bf16 vs exact-f32 contraction -------------
    # The default backward contraction runs three DEFAULT-precision bf16
    # passes over IN-KERNEL mantissa splits (chamfer_bwd_kernel.MATMUL_IMPL;
    # an XLA-side split is elided to zero by XLA:TPU — this check would
    # catch any such elision creeping into the Mosaic pipeline too).
    import geometric_adv_tpu.ops.pallas.chamfer_bwd_kernel as bwd_mod

    g1 = jnp.asarray(rng.rand(b, n).astype(np.float32))
    g2 = jnp.asarray(rng.rand(b, m).astype(np.float32))

    def bwd_with(impl):
        prev = bwd_mod.MATMUL_IMPL
        bwd_mod.MATMUL_IMPL = impl
        bwd_mod.chamfer_grad1_pallas.clear_cache()
        try:
            return np.asarray(
                bwd_mod.chamfer_grad1_pallas(x, y, i1k, i2k, g1, g2)
            )
        finally:
            bwd_mod.MATMUL_IMPL = prev
            bwd_mod.chamfer_grad1_pallas.clear_cache()

    gs = bwd_with("split3_bf16")
    gh = bwd_with("highest_f32")
    scale = max(float(np.max(np.abs(gh))), 1e-20)
    rel = float(np.max(np.abs(gs - gh))) / scale
    _check(
        "bwd kernel split3_bf16 vs highest_f32 (<=5e-6 rel)",
        rel <= 5e-6,
        f"max rel={rel:.3g}",
    )

    # --- 5: sparse encoder VJP vs dense autodiff -------------------------
    from geometric_adv_tpu.models import PointNetAE
    from geometric_adv_tpu.train import AETrainer, Configuration

    conf = Configuration(
        n_input=[256, 3], bneck_size=128, batch_size=8, learning_rate=0.01,
        dist_weight_list=[1.0], num_iterations=25, num_iterations_thresh=5,
        saver_step=None,
    )
    trainer = AETrainer(conf)
    model = trainer.model
    variables = {
        "params": trainer.state.params,
        "batch_stats": trainer.state.batch_stats,
    }
    sparse = se.make_sparse_encode(model, variables)

    def dense(xx):
        return model.apply(
            variables, xx, train=False, method=PointNetAE.encode
        )

    xe = jnp.asarray(rng.rand(8, 256, 3).astype(np.float32) - 0.5)
    _check(
        "sparse encoder forward bit-identical",
        bool(jnp.array_equal(jax.jit(sparse)(xe), jax.jit(dense)(xe))),
    )

    def scalarize(enc):
        return lambda a: jnp.sum(
            jnp.sin(enc(a).astype(jnp.float32))
            * jnp.arange(1.0, 129.0, dtype=jnp.float32)
        )

    with jax.default_matmul_precision("float32"):
        gs = np.asarray(jax.jit(jax.grad(scalarize(sparse)))(xe))
        gdn = np.asarray(jax.jit(jax.grad(scalarize(dense)))(xe))
    # f32 summation-order noise scales with element magnitude; atol covers
    # the near-zero elements (a pure max-rel metric flags 1e-10 abs diffs).
    # Calibration (CPU, f64 ground truth, this exact config): BOTH paths
    # deviate up to 1.5e-3 rel from the f64 gradient — that is the f32
    # chain's own noise floor — while agreeing with each other to 1.2e-4;
    # rtol 1e-3 therefore bounds their mutual distance at the accuracy
    # either one actually has.
    ok = bool(np.allclose(gs, gdn, rtol=1e-3, atol=1e-6))
    _check(
        "sparse encoder gradient == dense (f32 precision, summation order)",
        ok,
        f"max abs diff={float(np.max(np.abs(gs - gdn))):.3g}, "
        f"max rel@|g|>1e-3="
        f"{float(np.max(np.abs(gs - gdn) / np.maximum(np.abs(gdn), 1e-3))):.3g}",
    )

    # --- 6: short attack, sparse-vs-dense routing + trajectory -----------
    import geometric_adv_tpu.attack.core as attack_core
    from geometric_adv_tpu.attack.core import AttackRunner

    outs = {}
    for name, flag in (("sparse", True), ("dense", False)):
        prev = se.SPARSE_ENCODER_VJP
        se.SPARSE_ENCODER_VJP = flag
        try:
            # force identical chamfer routing for both arms (an explicit
            # impl skips the runner's on-chip calibration, checked below)
            runner = AttackRunner(
                trainer.model, trainer.state.params,
                trainer.state.batch_stats, conf, chamfer_impl="composed",
            )
        finally:
            se.SPARSE_ENCODER_VJP = prev
        # same clouds for both arms: fixed seed
        rng2 = np.random.RandomState(77)
        xs = jnp.asarray(rng2.rand(8, 256, 3).astype(np.float32) - 0.5)
        gts = jnp.asarray(rng2.rand(8, 256, 3).astype(np.float32) - 0.5)
        tz = trainer.get_latent_vectors(np.asarray(gts), batch_size=8)
        out = runner._attack_fn(
            xs, tz, gts, jnp.ones((8,), jnp.float32),
            jnp.asarray([1.0], jnp.float32),
        )
        outs[name] = np.asarray(out.metrics)
    dmet = float(
        np.max(
            np.abs(outs["sparse"] - outs["dense"])
            / np.maximum(np.abs(outs["dense"]), 1e-6)
        )
    )
    _check(
        "attack trajectory sparse vs dense encoder VJP",
        np.all(np.isfinite(outs["sparse"])) and dmet <= 5e-2,
        f"max rel metric diff={dmet:.3g} (bf16-matmul default; f32 "
        "semantics checked above)",
    )
    _check(
        "TPU auto-routing selects the sparse encoder VJP",
        se.sparse_enabled(),
    )

    # --- 7: on-chip chamfer-impl calibration routes the session winner ---
    # The decision must be BOUND TO THE RUNNER (chamfer_method), not pushed
    # into process globals: a second runner's calibration must not rewrite
    # the first runner's routing.
    attack_core._CHAMFER_CALIB_CACHE.clear()
    runner7 = AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats,
        conf,
    )
    calibrated = len(attack_core._CHAMFER_CALIB_CACHE) == 1
    decision = next(iter(attack_core._CHAMFER_CALIB_CACHE.values()), None)
    _check(
        "AttackRunner on-chip chamfer-impl calibration ran + routed",
        calibrated
        and runner7.chamfer_method == ("fused" if decision else "composed")
        and chamfer_mod.FUSED_LOSS_ENABLED is None,  # global untouched
        f"decision={'fused' if decision else 'composed'}, "
        f"bound={runner7.chamfer_method}",
    )

    # --- 7b: a second runner at another shape calibrates independently ---
    # (the round-4 review found the pre-fix decision was published through
    # a process global read at trace time, so a second runner could rewrite
    # the first one's routing; this pins the per-runner binding on device)
    method7_before = runner7.chamfer_method
    conf512 = Configuration(
        n_input=[512, 3], bneck_size=128, batch_size=8, learning_rate=0.01,
        dist_weight_list=[1.0], num_iterations=25, num_iterations_thresh=5,
        saver_step=None,
    )
    runner7b = AttackRunner(
        trainer.model, trainer.state.params, trainer.state.batch_stats,
        conf512,
    )
    decision_b = attack_core._CHAMFER_CALIB_CACHE.get(
        next(
            (k for k in attack_core._CHAMFER_CALIB_CACHE if k[1] == 512),
            None,
        )
    )
    _check(
        "second runner (512 pts) calibrated independently, first unchanged",
        len(attack_core._CHAMFER_CALIB_CACHE) == 2
        and runner7.chamfer_method == method7_before
        and runner7b.chamfer_method
        == ("fused" if decision_b else "composed")
        and chamfer_mod.FUSED_LOSS_ENABLED is None,
        f"512-pt decision={'fused' if decision_b else 'composed'}, "
        f"256-pt still bound={runner7.chamfer_method}",
    )

    # --- 8: EMD fused sweep vs composed approx_match+match_cost on TPU ---
    # The CPU suite asserts this equality in XLA:CPU arithmetic only; on
    # TPU the fused sweep's per-round distance recompute (ops/emd.py) gets
    # fused differently by XLA:TPU, so the agreement must be pinned on the
    # real chip. Unequal n/m exercises the integer multipliers.
    from geometric_adv_tpu.ops.emd import (
        approx_match,
        emd_loss_fused,
        match_cost,
    )

    xe1 = jnp.asarray(rng.rand(4, 512, 3).astype(np.float32) - 0.5)
    xe2 = jnp.asarray(rng.rand(4, 448, 3).astype(np.float32) - 0.5)

    def composed_emd(p):
        return match_cost(p, xe2, approx_match(p, xe2))

    vf_e = np.asarray(jax.jit(emd_loss_fused)(xe1, xe2))
    vc_e = np.asarray(jax.jit(composed_emd)(xe1))
    rel_e = float(np.max(np.abs(vf_e - vc_e) / np.maximum(np.abs(vc_e), 1e-9)))
    _check(
        "EMD fused sweep == composed approx_match+match_cost (value, 1e-4)",
        rel_e <= 1e-4,
        f"max rel={rel_e:.3g}",
    )

    gf_e = np.asarray(
        jax.jit(jax.grad(lambda p: jnp.sum(emd_loss_fused(p, xe2))))(xe1)
    )
    gc_e = np.asarray(
        jax.jit(jax.grad(lambda p: jnp.sum(composed_emd(p))))(xe1)
    )
    scale_e = max(float(np.max(np.abs(gc_e))), 1e-9)
    grel_e = float(np.max(np.abs(gf_e - gc_e))) / scale_e
    _check(
        "EMD fused sweep gradient == composed (rel 5e-4)",
        grel_e <= 5e-4,
        f"max rel={grel_e:.3g}",
    )

    # --- 9: frozen-payload chamfer (chamfer_refresh refresh op) ----------
    # Reuses check 2's x/y (non-multiple shapes + planted ties). The fused
    # payload kernel and the composed scatter-add fallback must agree on
    # device, and the frozen elementwise forms must reproduce the exact
    # chamfer loss and gradient when evaluated AT the refresh state
    # (delta == 0) — the contract attack/core.py's fast mode rests on.
    from geometric_adv_tpu.attack.core import _frozen_chamfer_terms
    from geometric_adv_tpu.ops import chamfer_loss_per_pc
    from geometric_adv_tpu.ops.chamfer import chamfer_frozen_payloads

    pk = jax.jit(lambda a, b: chamfer_frozen_payloads(a, b, "kernel"))(x, y)
    pc = jax.jit(lambda a, b: chamfer_frozen_payloads(a, b, "composed"))(
        x, y
    )
    d1_pk, d2_pk, nn1_pk, snn1_pk, cnt1_pk = (np.asarray(t) for t in pk)
    d1_pc, d2_pc, nn1_pc, snn1_pc, cnt1_pc = (np.asarray(t) for t in pc)
    snn_dev = float(np.max(np.abs(snn1_pk - snn1_pc)))
    _check(
        "frozen payloads: kernel route == composed scatter fallback",
        np.array_equal(d1_pk, d1_pc)
        and np.array_equal(d2_pk, d2_pc)
        and np.array_equal(nn1_pk, nn1_pc)
        and np.array_equal(cnt1_pk, cnt1_pc)
        and snn_dev <= 1e-5,  # f32 accumulation order differs
        f"max|snn diff|={snn_dev:.3g}",
    )

    payload = {
        "nn1": pk[2],
        "r": pk[3] - pk[4][..., None] * x,
        "cnt": pk[4],
        "d2sum0": jnp.sum(pk[1], axis=-1),
        "x1_0": x,
    }

    def frozen_pc_loss(z):
        d1f, mean_d2 = _frozen_chamfer_terms(z, payload, m)
        return jnp.mean(d1f, axis=-1) + mean_d2

    v_frozen = np.asarray(jax.jit(frozen_pc_loss)(x))
    v_exact = np.asarray(
        jax.jit(lambda a: chamfer_loss_per_pc(a, y, method="composed"))(x)
    )
    g_frozen = np.asarray(
        jax.jit(jax.grad(lambda z: jnp.sum(frozen_pc_loss(z))))(x)
    )
    g_exact = np.asarray(
        jax.jit(
            jax.grad(
                lambda z: jnp.sum(chamfer_loss_per_pc(z, y, method="composed"))
            )
        )(x)
    )
    v_rel = float(np.max(np.abs(v_frozen - v_exact) / np.abs(v_exact)))
    g_scale = max(float(np.max(np.abs(g_exact))), 1e-9)
    g_rel = float(np.max(np.abs(g_frozen - g_exact))) / g_scale
    _check(
        "frozen forms at delta=0 == exact chamfer loss+grad (1e-5)",
        v_rel <= 1e-5 and g_rel <= 1e-5,
        f"value rel={v_rel:.3g}, grad rel={g_rel:.3g}",
    )

    # --- 10: single-pass EMD sweep kernel vs XLA sweep on real Mosaic ----
    import geometric_adv_tpu.ops.emd as emd_mod

    _check(
        "EMD auto-routing gate admits the sweep kernel at 512x448",
        emd_mod.EMD_FUSED_IMPL == "auto"
        and emd_mod._use_fused_sweep(512, 448),
    )
    prev_impl = emd_mod.EMD_FUSED_IMPL
    try:
        outs_emd = {}
        for impl in ("xla", "fused"):
            emd_mod.EMD_FUSED_IMPL = impl
            v10, g10 = jax.jit(
                jax.value_and_grad(
                    lambda p: jnp.sum(emd_loss_fused(p, xe2))
                )
            )(xe1)
            outs_emd[impl] = (float(v10), np.asarray(g10))
    finally:
        emd_mod.EMD_FUSED_IMPL = prev_impl
    v_x10, g_x10 = outs_emd["xla"]
    v_f10, g_f10 = outs_emd["fused"]
    vrel10 = abs(v_f10 - v_x10) / abs(v_x10)
    gscale10 = max(float(np.max(np.abs(g_x10))), 1e-9)
    grel10 = float(np.max(np.abs(g_f10 - g_x10))) / gscale10
    _check(
        "EMD sweep kernel == XLA sweep on device (value 1e-5, grad 1e-4)",
        vrel10 <= 1e-5 and grel10 <= 1e-4,
        f"value rel={vrel10:.3g}, grad rel={grel10:.3g} "
        "(reference acceptance bar is 1e-2/entry, approxmatch.cpp:218-230)",
    )

    # --- 11: metro hausdorff_sampled at the 30k default on device --------
    # The TPU branch runs ONE [1, 30000, 30000] v2-kernel pass per
    # direction (transfer/metro.py:hausdorff_sampled) — m_pad 30080 is far
    # outside every other check's shape envelope, so the tile-pick/VMEM
    # budget at the metro default is only proven here (the CPU suite tests
    # the chunked fallback path). Cross-check: the chunked row-reduction
    # form on the SAME device; both compute exact max-of-min so they must
    # agree to f32 roundoff.
    from geometric_adv_tpu.transfer.metro import (
        _directed_max_min_sq,
        hausdorff_sampled,
    )

    mrng = np.random.RandomState(7)
    s1 = jnp.asarray(mrng.rand(30_000, 3).astype(np.float32) - 0.5)
    s2 = jnp.asarray(mrng.rand(30_000, 3).astype(np.float32) * 1.2 - 0.6)
    h_kernel = float(jax.jit(hausdorff_sampled)(s1, s2))

    @jax.jit
    def h_chunked(a, b):
        return jnp.sqrt(
            jnp.maximum(_directed_max_min_sq(a, b), _directed_max_min_sq(b, a))
        )

    h_ref = float(h_chunked(s1, s2))
    hdev = abs(h_kernel - h_ref) / max(abs(h_ref), 1e-9)
    _check(
        "metro hausdorff_sampled @30k default: kernel == chunked (1e-5)",
        np.isfinite(h_kernel) and hdev <= 1e-5,
        f"kernel={h_kernel:.6f}, chunked={h_ref:.6f}, rel={hdev:.3g}",
    )

    # --- 12: chunk-screened matrix fast mode on device (PARITY #14) ------
    # full coverage (k == C) must reproduce the exact matrix through the
    # Morton-sort + gather path; the partial screen must majorize it.
    from geometric_adv_tpu.ops.pairwise import chamfer_distance_matrix

    prng = np.random.RandomState(11)
    ppcs = prng.rand(24, 2048, 3).astype(np.float32)
    m_exact = chamfer_distance_matrix(ppcs, pair_block=32)
    m_full = chamfer_distance_matrix(
        ppcs, pair_block=32, screen_chunks=16, screen_k=16
    )
    m_part = chamfer_distance_matrix(
        ppcs, pair_block=32, screen_chunks=64, screen_k=8
    )
    full_dev = float(
        np.max(np.abs(m_full - m_exact) / np.maximum(np.abs(m_exact), 1e-9))
    )
    majorizes = bool(np.all(m_part >= m_exact - 1e-6))
    _check(
        "screened matrix @2048: full-coverage == exact (1e-5), k=8 majorizes",
        full_dev <= 1e-5 and majorizes,
        f"full-coverage rel={full_dev:.3g}, majorizes={majorizes}",
    )

    print(
        f"\n{'ALL CHECKS PASSED' if not _FAILURES else 'FAILURES: ' + ', '.join(_FAILURES)}",
        flush=True,
    )
    sys.exit(1 if _FAILURES else 0)


if __name__ == "__main__":
    main()
