"""Headline benchmark: sampled jets/sec/chip, JetNet-150 EPiC-FM, midpoint ODE.

Protocol (mirrors the reference's measurement conventions):
  - model: EPiC encoder, hidden 128, latent 10, 6 EPiC layers, cosine t-emb
    (reference configs/model/flow_matching.yaml defaults)
  - sampling: midpoint solver; PRIMARY setting NFE=100 (ode_steps=51, i.e.
    50 steps x 2 NFE — the BASELINE.json north-star setting), plus a
    secondary NFE=198 measurement (ode_steps=100, round-1 setting)
  - batch 640 x 48 scanned sub-batches per dispatch (measured optimum on
    v5e: large batches lose ~30% to HBM pressure — 1024x16 gives 20.5k,
    2048x8 14.4k, 4096x8 7.7k, 640x48 21.2k); the first batches are excluded
    from timing as compile/warm-up (reference utils/data_generation.py:82-83)

vs_baseline is measured against an *estimated* A100 eager-PyTorch throughput
for the same model/protocol, derived from a FLOPs model (6.67 GFLOP/jet at
100 NFE per XLA cost analysis, ~10% effective utilization on eager
fp32/TF32): ~1465 jets/s at NFE=100 (= 740 jets/s at NFE=198 scaled by
198/100). The reference repo publishes no benchmark numbers (BASELINE.md),
so this anchor is explicit and conservative; the target from BASELINE.json
is >=10x. Measured 2026-08 on one v5e chip: ~21,200 jets/s at NFE=100
(14.5x, 72% MFU), ~10,800 jets/s at NFE=198.

To make the claim auditable independently of that estimate, the output also
reports absolute FLOPs/jet (XLA cost analysis of the compiled sampler, with
an analytic EPiC FLOPs model as fallback), achieved TFLOP/s, and MFU against
the chip's bf16 peak.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

from particle_fm_tpu.models.flow_matching import FlowMatchingModel

# estimated A100 eager-torch reference at NFE=100 (see docstring)
BASELINE_JETS_PER_SEC_NFE100 = 740.0 * 198.0 / 100.0

# ---------------------------------------------------------------------------
# Per-arch A100 eager-torch baseline model (the reference ships eager fp32;
# configs/trainer/default.yaml leaves `precision: 16` commented out, and there
# is no torch.compile / sdpa-flash anywhere in the repo). Each family's
# baseline throughput is a two-component eager roofline over its own audited
# FLOPs split:
#
#     t_jet = nfe * (dense_flops / DENSE_EFF + attn_flops / ATTN_EFF)
#
#   DENSE_EFF: cuBLAS TF32 throughput at the family's dense shapes. The
#     batched GEMMs are (B*150, C, C): at C=256 (droid) cuBLAS sustains
#     ~30-50% of the 156 TF/s TF32 peak -> 50 TF/s is the GENEROUS end; at
#     C=128 (cross-attn/epic-like widths) ~25 TF/s; epic's h=128-with-
#     latent-10 mix of tiny pools keeps its original audited 9.8 TF/s
#     (6.3% of peak — the round-2 calibration, unchanged for continuity).
#   ATTN_EFF: eager materialized attention is a chain of tiny-K batched
#     bmms (K = head_dim 16) + separate softmax kernels: ~10 TF/s on the
#     matmul component (TF32 bmm at K=16 runs at ~6-13% peak).
#
# Estimates deliberately IGNORE eager per-op launch overhead and the f32
# attention-score HBM traffic (both would only slow the baseline down), so
# they are upper-bound-leaning: a vs_baseline >= 1 here is a conservative
# claim. flops audited per arch by XLA cost analysis (see _flops_per_jet);
# the dense/attn split is analytic (head_dim/L/layers below).
A100_DENSE_EFF = {"epic": 9.8e12, "droid_fulltransformer": 50e12,
                  "droid_fullcrossattention": 25e12, "mdma": 25e12}
A100_ATTN_EFF = 10e12


def _attn_flops_per_jet_nfe(name: str) -> float:
    """Analytic attention-matmul FLOPs (QK^T + PV) per jet per NFE for the
    production configs in _secondary_archs; the remainder of the audited
    total is 'dense'."""
    if name == "droid_fulltransformer":
        # 3 layers, 16 heads x head_dim 16, L=150 self-attention
        return 3 * 2 * (2 * 150 * 150 * 16) * 16
    if name == "droid_fullcrossattention":
        # 8 cross-attention blocks vs the 150-node set (model_dim 128,
        # 16 heads x head_dim 8)
        return 8 * 2 * (2 * 150 * 150 * 8) * 16
    if name == "mdma":
        # 8 layers: ONE class-token query attends over 150 particles
        # (Lq=1 — nets/mdma.py), so attention matmuls are negligible and the
        # family is dense-dominated (hidden-256 per-particle MLPs)
        return 8 * 2 * (2 * 1 * 150 * (256 // 8)) * 8
    return 0.0  # epic: no attention


def _baseline_jets_per_sec(name: str, flops_per_jet_nfe100: float) -> float:
    """A100 eager-torch baseline throughput at NFE=100 for one family."""
    if name == "epic":
        return BASELINE_JETS_PER_SEC_NFE100
    attn = _attn_flops_per_jet_nfe(name) * 100.0
    dense = max(flops_per_jet_nfe100 - attn, 0.0)
    t = dense / A100_DENSE_EFF[name] + attn / A100_ATTN_EFF
    return 1.0 / t

BATCH = 640
SCAN_K = 48  # sub-batches per dispatch (lax.scan inside the jitted sampler)
N_TIMED_BATCHES = 2  # dispatches; total timed jets = BATCH * SCAN_K * N
SOLVER = "midpoint"

# bf16 peak TFLOP/s per chip by device kind (public TPU specs)
PEAK_TFLOPS = {"v4": 275.0, "v5e": 197.0, "v5p": 459.0, "v6e": 918.0}


def _peak_tflops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return 197.0  # default to v5e


def _analytic_flops_per_jet(nfe: int, n=150, h=128, latent=10, layers=6) -> float:
    """Analytic EPiC FLOPs model (matmul 2*m*n*k only, the dominant term).

    Per NFE, per jet: input/output projections (~2*n*3*h each), and per EPiC
    layer two global MLPs (~2*(2h)*h + 2*h*h on the pooled vector, amortized
    over n) plus two local MLPs (~2*n*(2h)*h + 2*n*h*h)."""
    proj = 2 * 2 * n * 3 * h
    per_layer_local = 2 * n * (2 * h) * h + 2 * n * h * h
    per_layer_global = (2 * (2 * h + latent) * h + 2 * h * latent) * 2
    return float(nfe * (proj + layers * (per_layer_local + per_layer_global)))


def _flops_per_jet(
    model, variables, nfe: int, batch: int = None, arch: str = "epic"
) -> tuple[float, str]:
    """FLOPs per jet = (XLA cost analysis of ONE loop-free vector-field
    eval) x NFE. XLA's cost model counts lax.scan/while bodies once, so the
    compiled sampler's own number is useless — the loop-free single eval is
    exact. Analytic matmul model as fallback where the backend reports no
    flops. Measured (v5e, NFE=100): epic 6.67, droid_fulltransformer 67.1,
    droid_fullcrossattention 37.3, mdma 64.5 GFLOP/jet."""
    batch = batch or BATCH
    try:
        t = jnp.full((batch,), 0.5)
        x = jnp.zeros((batch, 150, 3))
        mask1 = jnp.ones((batch, 150, 1))

        def vf(t, x, mask):
            return model.vector_field(variables, t, x, mask=mask)

        cost = jax.jit(vf).lower(t, x, mask1).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost["flops"])
        if flops > 0:
            return flops / batch * nfe, "xla_cost_analysis_single_vf_x_nfe"
    except Exception:
        pass
    if arch != "epic":
        # the analytic fallback models the EPiC family only; reporting it for
        # another arch would silently compute MFU/baseline from wrong-family
        # FLOPs (ADVICE r4) — surface "unavailable" instead
        return 0.0, "unavailable_xla_cost_analysis_failed"
    return _analytic_flops_per_jet(nfe), "analytic_matmul_model"


def _secondary_archs():
    """Production configs of the other three vector-field families
    (configs/model/fm_droid_transformer.yaml, fm_droid_crossattention.yaml,
    flow_matching_mdma.yaml), benchmarked on the same JetNet-150 protocol."""
    droid_t = FlowMatchingModel(
        model="droid_fulltransformer", features=3, num_particles=150,
        frequencies=16, t_emb="cosine", add_time_to_input=True,
        loss_type="FM-OT", dtype=jnp.bfloat16,
        net_config=dict(
            te_config=dict(
                model_dim=256, num_layers=3,
                mha_config=dict(num_heads=16, do_layer_norm=True,
                                scores_dtype="bfloat16"),
                dense_config=dict(act_h="lrlu", nrm="layer"),
            ),
            node_embd_config=dict(act_h="lrlu", nrm="layer"),
            ctxt_embd_config=dict(outp_dim=64, act_h="lrlu", nrm="layer"),
            outp_embd_config=dict(act_h="lrlu", nrm="layer"),
        ),
    )
    droid_ca = FlowMatchingModel(
        model="droid_fullcrossattention", features=3, num_particles=150,
        frequencies=16, t_emb="cosine", add_time_to_input=True,
        loss_type="FM-OT", dtype=jnp.bfloat16,
        net_config=dict(
            cae_config=dict(
                model_dim=128, num_layers=8,
                mha_config=dict(num_heads=16, do_layer_norm=True,
                                scores_dtype="bfloat16"),
                dense_config=dict(hddn_dim=256, act_h="lrlu", nrm="layer"),
            ),
            node_embd_config=dict(act_h="lrlu", nrm="layer"),
            ctxt_embd_config=dict(outp_dim=64, act_h="lrlu", nrm="layer"),
            outp_embd_config=dict(act_h="lrlu", nrm="layer"),
        ),
    )
    mdma = FlowMatchingModel(
        model="mdma", features=3, num_particles=150, frequencies=16,
        t_emb="cosine", add_time_to_input=False, loss_type="CFM",
        dtype=jnp.bfloat16,
        net_config=dict(latent=16, hidden_dim=256, layers=8, num_heads=8,
                        t_local_cat=True, t_global_cat=True),
    )
    # per-arch sampling batch (tuned on v5e, 2026-08 sweep with 3-rep medians
    # at constant jets/dispatch): droid plateaus at B 96-192 (555 jets/s vs
    # 411 at 640 — attention score tensors over-subscribe HBM at large B);
    # cross-attention peaks at its original 640; MDMA has a sharp XLA
    # layout/fusion sweet spot at exactly 256 (2154 jets/s vs ~1450-1670 at
    # 192/224/288/384), reproduced across independent runs.
    return {"droid_fulltransformer": (droid_t, 128),
            "droid_fullcrossattention": (droid_ca, 640),
            "mdma": (mdma, 256)}


def main():
    model = FlowMatchingModel(
        model="epic",
        features=3,
        num_particles=150,
        hidden_dim=128,
        latent=10,
        layers=6,
        frequencies=16,
        t_emb="cosine",
        t_local_cat=True,
        t_global_cat=True,
        add_time_to_input=False,
        loss_type="FM-OT",
        sigma=1e-4,
        dtype=jnp.bfloat16,
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng)
    mask = jnp.ones((BATCH, 150, 1))

    def make_run(ode_steps, solver=None):
        # close over the weights: a deployed sampler holds its parameters
        # (like the torch reference's module) — re-passing the param pytree
        # per call costs ~25% in per-leaf dispatch overhead on this host.
        # lax.scan over SCAN_K sub-batches amortizes the host->relay dispatch
        # (~20-30 ms/call on this env) over 16x more jets per call; the full
        # (SCAN_K, BATCH, 150, 3) sample tensor is returned (materialized to
        # HBM), so this measures a real producing sampler, not a reduced one.
        @jax.jit
        def run(key):
            def body(_, k):
                out = model.sample(
                    variables, k, n_samples=BATCH, mask=mask,
                    ode_solver=solver or SOLVER, ode_steps=ode_steps,
                )
                return None, out

            _, outs = jax.lax.scan(body, None, jax.random.split(key, SCAN_K))
            return outs

        return run

    def materialize(out):
        # On some PJRT plugins (axon relay) block_until_ready returns before
        # compilation/execution completes; a host transfer is the only
        # reliable fence, so sync on a scalar reduction.
        return float(jnp.sum(out))

    def measure(ode_steps, solver=None):
        run = make_run(ode_steps, solver)
        # two warm-up batches (compile + first-execution relay costs), excluded
        materialize(run(jax.random.PRNGKey(1)))
        materialize(run(jax.random.PRNGKey(0)))
        # dispatch all timed batches, fence once at the end: executions are
        # sequential on the device, so this measures true device throughput
        # without paying the ~20 ms relay fence latency per batch (a deployed
        # sampler pipelines batches the same way)
        t0 = time.perf_counter()
        outs = [run(jax.random.PRNGKey(2 + i)) for i in range(N_TIMED_BATCHES)]
        for out in outs:
            materialize(out)
        dt = time.perf_counter() - t0
        return BATCH * SCAN_K * N_TIMED_BATCHES / dt, run

    # primary: NFE=100 (ode_steps=51 -> 50 midpoint steps x 2 NFE)
    jets_100, run_100 = measure(51)
    # secondary: NFE=198 (round-1 setting, ode_steps=100)
    jets_198, _ = measure(100)
    # quality-matched: NFE=50 (ode_steps=26) — the solver is converged by
    # NFE~50 on this config (docs/RESULTS.md quality-vs-NFE study), so this
    # is the fastest setting with headline-equal W1M
    jets_50, _ = measure(26)
    # ReFlow-distilled setting: ONE Euler step (NFE=1). Same architecture and
    # weights layout — throughput is weight-independent; the quality evidence
    # (a rectified student matches the teacher's NFE=100 W1M at NFE=1) is the
    # flagship ReFlow run in docs/RESULTS.md (scripts/reflow.py).
    jets_1, _ = measure(2, solver="euler")

    # per-arch throughput at NFE=100 (production configs of the other three
    # vector-field families at their tuned batch sizes; ~5k jets per timed
    # dispatch to bound bench wall time), with the same accountability keys
    # as the flagship line: audited FLOPs/jet, achieved TFLOP/s, MFU, and
    # the per-family A100 eager baseline (see the baseline-model comment)
    peak = _peak_tflops()
    arch_jets, arch_detail = {}, {}
    for name, (amodel, abatch) in _secondary_archs().items():
        avars = amodel.init(jax.random.PRNGKey(0))
        scan_k = max(1, 5120 // abatch)
        amask = jnp.ones((abatch, 150, 1))

        @jax.jit
        def arun(key):
            def body(_, k):
                return None, amodel.sample(
                    avars, k, n_samples=abatch, mask=amask,
                    ode_solver=SOLVER, ode_steps=51,
                )

            _, outs = jax.lax.scan(body, None, jax.random.split(key, scan_k))
            return outs

        materialize(arun(jax.random.PRNGKey(1)))
        materialize(arun(jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        materialize(arun(jax.random.PRNGKey(2)))
        jets = abatch * scan_k / (time.perf_counter() - t0)
        arch_jets[name] = round(jets, 2)
        a_flops, a_src = _flops_per_jet(amodel, avars, nfe=100, batch=abatch, arch=name)
        arch_detail[name] = {
            "jets_per_sec": round(jets, 2),
            "flops_per_jet_nfe100": round(a_flops),
            "flops_source": a_src,
        }
        if a_flops > 0:
            a_baseline = _baseline_jets_per_sec(name, a_flops)
            arch_detail[name].update({
                "achieved_tflops": round(a_flops * jets / 1e12, 3),
                "mfu": round(a_flops * jets / 1e12 / peak, 5),
                "baseline_a100_eager_jets_per_sec": round(a_baseline, 1),
                "vs_baseline": round(jets / a_baseline, 3),
            })

    # training throughput (secondary key): the production scanned-epoch path
    # (one jitted lax.scan over K full steps — loss, grads, AdamW, EMA).
    # Batch 320 x 200 steps/dispatch: the measured optimum (2026-08 sweep at
    # constant 128k jets/dispatch: B=192/320 hit 288-292k jets/s vs 255k at
    # B=640 and 157k at B=4096 — the same HBM-pressure falloff as sampling).
    # K=200 reports the device's steady-state rate: at the old K=20 the
    # ~30 ms/dispatch axon-relay latency (NOT overlapped by async dispatch
    # on this env, and not paid by a normal TPU host) faked ~20% slower.
    def measure_train():
        from particle_fm_tpu.parallel.train import (
            create_train_state,
            make_optimizer,
            make_train_epoch,
        )

        t_batch, k_steps = 320, 200
        opt = make_optimizer(lr=1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0), opt)
        epoch = make_train_epoch(model, opt)
        xs = jax.random.normal(jax.random.PRNGKey(1), (k_steps, t_batch, 150, 3))
        ms = jnp.ones((k_steps, t_batch, 150, 1))
        for i in range(2):  # compile + first-execution warm-up
            state, losses = epoch(state, jax.random.PRNGKey(2 + i), xs, ms, None)
        float(jnp.sum(losses))
        t0 = time.perf_counter()
        n_epochs = 2
        for i in range(n_epochs):
            state, losses = epoch(state, jax.random.PRNGKey(10 + i), xs, ms, None)
        float(jnp.sum(losses))  # host fence
        return t_batch * k_steps * n_epochs / (time.perf_counter() - t0)

    train_jets = measure_train()

    # train-side FLOPs audit (VERDICT r3 item 5): XLA cost analysis of ONE
    # full jitted training step (loss fwd + bwd + AdamW/clip + EMA) at the
    # tuned B=320 — the scanned epoch is this step K times, so per-jet FLOPs
    # from the single step anchor train_mfu exactly like the sampler audit.
    def _train_flops_per_jet():
        from particle_fm_tpu.parallel.train import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        t_batch = 320
        opt = make_optimizer(lr=1e-3)
        state = create_train_state(model, jax.random.PRNGKey(0), opt)
        step = make_train_step(model, opt)
        xb = jnp.zeros((t_batch, 150, 3))
        mb = jnp.ones((t_batch, 150, 1))
        cost = (
            jax.jit(step)
            .lower(state, jax.random.PRNGKey(1), xb, mb, None)
            .compile()
            .cost_analysis()
        )
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost["flops"]) / t_batch

    try:
        train_flops_per_jet = _train_flops_per_jet()
    except Exception:
        train_flops_per_jet = 0.0
    train_tflops = train_flops_per_jet * train_jets / 1e12

    del run_100
    flops_per_jet, flops_src = _flops_per_jet(model, variables, nfe=100)
    achieved_tflops = flops_per_jet * jets_100 / 1e12

    print(
        json.dumps(
            {
                "metric": "sampled_jets_per_sec_per_chip_jetnet150_epicfm_nfe100",
                "value": round(jets_100, 2),
                "unit": "jets/s/chip",
                "vs_baseline": round(jets_100 / BASELINE_JETS_PER_SEC_NFE100, 3),
                "nfe198_jets_per_sec": round(jets_198, 2),
                "nfe50_quality_matched_jets_per_sec": round(jets_50, 2),
                "reflow_nfe1_jets_per_sec": round(jets_1, 2),
                "arch_jets_per_sec_nfe100": arch_jets,
                "arch_perf_nfe100": arch_detail,
                "train_jets_per_sec": round(train_jets, 2),
                "train_flops_per_jet": round(train_flops_per_jet),
                "train_achieved_tflops": round(train_tflops, 3),
                "train_mfu": round(train_tflops / peak, 5),
                "flops_per_jet_nfe100": round(flops_per_jet),
                "flops_source": flops_src,
                "achieved_tflops": round(achieved_tflops, 3),
                "peak_bf16_tflops": peak,
                "mfu": round(achieved_tflops / peak, 5),
                "device_kind": jax.devices()[0].device_kind,
            }
        )
    )


if __name__ == "__main__":
    main()
