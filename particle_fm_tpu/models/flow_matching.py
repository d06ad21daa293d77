"""FlowMatchingModel — the generic set generative model.

The TPU-native counterpart of the reference's `SetFlowMatchingLitModule`
(particle_fm/models/flow_matching_module.py:350-677): one model class covers
all 4 architectures x 5 loss families, with masked train/val losses and a
jitted `sample()` that integrates the learned vector field.

Design: the flax module (`CNFStack`) holds parameters; this class is a pure
configuration + function bundle. Everything it returns is jit-compatible and
has no Python-level state, so train steps and samplers compose with
jax.jit / shard_map untouched.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from particle_fm_tpu.losses.diffusion import VPDiffusionSchedule
from particle_fm_tpu.losses.flow_matching import get_loss_fn
from particle_fm_tpu.models.cnf import CNFStack
from particle_fm_tpu.samplers.ode import odeint_dopri5, odeint_fixed, odeint_fixed_sc
from particle_fm_tpu.samplers.sde import ddim_sampler, euler_maruyama_sampler

_FIXED_SOLVERS = ("euler", "midpoint", "heun", "rk4", "ab2", "ab3")


@dataclasses.dataclass(eq=False)  # identity hash: instances are static under jit
class FlowMatchingModel:
    """Configuration-bundle for CNF training/sampling on particle sets."""

    model: str = "epic"
    features: int = 3
    num_particles: int = 150
    frequencies: int = 6
    hidden_dim: int = 128
    layers: int = 8
    n_transforms: int = 1
    activation: str = "leaky_relu"
    use_weight_norm: bool = True
    use_normaliser: bool = False
    normaliser_config: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    net_config: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    # epic
    latent: int = 16
    t_local_cat: bool = False
    t_global_cat: bool = False
    add_time_to_input: bool = True
    global_cond_dim: int = 0
    local_cond_dim: int = 0
    dropout: float = 0.0
    sum_scale: float = 1e-2
    # loss
    loss_type: str = "FM-OT"
    sigma: float = 1e-4
    t_emb: str = "sincos"
    diff_config: Mapping[str, Any] = dataclasses.field(
        default_factory=lambda: {"max_sr": 1.0, "min_sr": 1e-8}
    )
    criterion: str = "mse"
    # droid VE-style noise range (see losses.droid_loss): 1.0 = exact
    # reference behavior; >> data std makes the droid loss generative
    droid_t_max: float = 1.0
    ot_config: Mapping[str, Any] = dataclasses.field(default_factory=dict)
    # self-conditioning (reference notebook-02-only CFM variant, first-class
    # here): the net consumes cat(x, x1_hat) where x1_hat = stopgrad(y - t*tm*v)
    # (tm = droid_t_max for the droid loss, else 1) is its own data-endpoint
    # estimate, fed half the time in training and carried across integration
    # steps in sampling (odeint_fixed_sc)
    self_cond: bool = False
    # classifier-free guidance (beyond reference): probability of replacing a
    # set's conditioning vector with the null token (zeros, in normalized
    # space when use_normaliser) during training. Enables
    # sample(guidance_scale=w): v = v_null + w*(v_cond - v_null).
    cond_dropout: float = 0.0
    dtype: Any = None  # compute dtype for the network (e.g. jnp.bfloat16)

    def __post_init__(self):
        if self.self_cond:
            if self.loss_type not in ("FM-OT", "CFM", "CFM-OT", "droid"):
                raise ValueError(
                    "self_cond requires a linear-path loss (FM-OT/CFM/CFM-OT/"
                    f"droid) where x1_hat = y - t*v, got {self.loss_type}"
                )
            if self.n_transforms != 1:
                raise ValueError("self_cond supports n_transforms=1")
        cnf_config = dict(
            model=self.model,
            frequencies=self.frequencies,
            hidden_dim=self.hidden_dim,
            layers=self.layers,
            local_cond_dim=self.local_cond_dim,
            latent=self.latent,
            activation=self.activation,
            use_weight_norm=self.use_weight_norm,
            t_local_cat=self.t_local_cat,
            t_global_cat=self.t_global_cat,
            add_time_to_input=self.add_time_to_input,
            t_emb=self.t_emb,
            dropout=self.dropout,
            sum_scale=self.sum_scale,
            self_cond=self.self_cond,
            net_config=dict(self.net_config),
            dtype=self.dtype,
        )
        self.module = CNFStack(
            n_transforms=self.n_transforms,
            features=self.features,
            global_cond_dim=self.global_cond_dim,
            use_normaliser=self.use_normaliser,
            normaliser_config=dict(self.normaliser_config),
            cnf_config=cnf_config,
        )
        # sampling-time twin with weight norm disabled: the g*v/||v||
        # reparametrization is folded into the kernels ONCE before the ODE
        # scan instead of being recomputed at every step (XLA does not hoist
        # it out of the loop; measured ~6% of sampling time)
        if self.use_weight_norm:
            folded_cnf = dict(cnf_config, use_weight_norm=False)
            self._module_folded = CNFStack(
                n_transforms=self.n_transforms,
                features=self.features,
                global_cond_dim=self.global_cond_dim,
                use_normaliser=self.use_normaliser,
                normaliser_config=dict(self.normaliser_config),
                cnf_config=folded_cnf,
            )
        else:
            self._module_folded = None
        self._loss_fn = get_loss_fn(
            self.loss_type,
            sigma=self.sigma,
            criterion=self.criterion,
            diff_config=dict(self.diff_config),
            ot_config=dict(self.ot_config),
            droid_t_max=self.droid_t_max,
        )
        self.conditioned = self.global_cond_dim > 0

    # ------------------------------------------------- weight-norm folding
    def fold_weight_norm(self, variables: dict) -> tuple[object, dict]:
        """Fold w = g * v / ||v|| into the kernels; returns (module, variables)
        to use for inference. No-op when weight norm is disabled."""
        if self._module_folded is None:
            return self.module, variables

        def fold(tree):
            if isinstance(tree, dict):
                if "kernel" in tree and "g" in tree:
                    v = tree["kernel"]
                    g = tree["g"]
                    norm = jnp.linalg.norm(v, axis=0, keepdims=True)
                    out = {k: val for k, val in tree.items() if k != "g"}
                    out["kernel"] = v * (g[None, :] / jnp.maximum(norm, 1e-12))
                    return out
                return {k: fold(v) for k, v in tree.items()}
            return tree

        folded = dict(variables)
        folded["params"] = fold(variables["params"])
        return self._module_folded, folded

    # ------------------------------------------------------------- init
    def init(self, rng: jax.Array, batch_size: int = 2) -> dict:
        x = jnp.zeros((batch_size, self.num_particles, self.features))
        t = jnp.zeros((batch_size,))
        mask = jnp.ones((batch_size, self.num_particles, 1))
        cond = jnp.zeros((batch_size, self.global_cond_dim)) if self.conditioned else None
        variables = self.module.init(rng, t, x, cond=cond, mask=mask)
        return dict(variables)

    # ----------------------------------------------------- vector field
    def vector_field(self, variables, t, x, cond=None, mask=None):
        return self.module.apply(variables, t, x, cond=cond, mask=mask)

    # --------------------------------------------------------- loss
    def loss_accum_weight(self, x, mask):
        """Gradient-accumulation weight: the loss-normalization mass of one
        microbatch. Every FM loss normalizes by mask.sum() (losses/
        flow_matching.py::_reduce), so weighting microbatch gradients by it
        makes the accumulated gradient equal the big-batch gradient exactly."""
        if mask is None:
            return jnp.asarray(x.shape[0] * x.shape[1], jnp.float32)
        return jnp.sum(mask).astype(jnp.float32)

    def loss(
        self,
        variables: dict,
        rng: jax.Array,
        x: jnp.ndarray,
        mask: jnp.ndarray | None = None,
        cond: jnp.ndarray | None = None,
        train: bool = False,
        vf_fn=None,
    ) -> tuple[jnp.ndarray, dict]:
        """Masked training/val loss. Returns (loss, updated_norm_stats).

        When `use_normaliser` and train=True, x/cond are standardized in-model
        and the running stats are updated (reference training_step:512-522).

        `vf_fn(variables, t, y, cond, mask)` optionally overrides the vector
        field — the injection point for the pipeline-parallel forward
        (parallel/pp.py), which must bypass module.apply to stage the layer
        stack over the mesh.
        """
        new_stats = {}
        if self.use_normaliser:
            mutable = ["norm_stats"] if train else []
            x, updates = self.module.apply(
                variables, x, mask, update_stats=train, method="normalise", mutable=mutable
            ) if train else (
                self.module.apply(variables, x, mask, method="normalise"),
                {},
            )
            if train:
                new_stats = updates
                variables = {**variables, **updates}
            if self.conditioned and cond is not None:
                if train:
                    # variables already carry the x-normaliser update, so this
                    # returned collection contains both submodules' stats
                    cond, new_stats = self.module.apply(
                        variables,
                        cond,
                        update_stats=True,
                        method="normalise_cond",
                        mutable=["norm_stats"],
                    )
                    variables = {**variables, **new_stats}
                else:
                    cond = self.module.apply(variables, cond, method="normalise_cond")

        if self.self_cond and vf_fn is not None:
            raise ValueError("self_cond is not supported with a vf_fn override (pp)")

        if train and self.cond_dropout > 0.0 and self.conditioned and cond is not None:
            # classifier-free guidance training: drop whole sets' conditioning
            # to the null token (zeros — post-normalization when the model
            # normalizes cond, so train and sample agree on the null)
            rng, rng_cd = jax.random.split(rng)
            keep = jax.random.bernoulli(
                rng_cd, 1.0 - self.cond_dropout, (cond.shape[0], 1)
            )
            cond = jnp.where(keep, cond, 0.0)

        if self.self_cond:
            rng, rng_sc = jax.random.split(rng)
            # data-endpoint estimate along the linear path: y = x + t*tm*u
            # for droid (physical time t*droid_t_max, losses.droid_loss), so
            # x1_hat = y - t*tm*v; tm = 1 for FM-OT/CFM/CFM-OT
            sc_tm = self.droid_t_max if self.loss_type == "droid" else 1.0

            def vf(t, y, c, m):
                # two-pass self-conditioning (notebook-02 semantics): a cold
                # pass yields the stop-gradient endpoint estimate, fed to the
                # trained pass for a random half of the sets
                v0 = self.module.apply(variables, t, y, cond=c, mask=m)
                x1_hat = jax.lax.stop_gradient(y - sc_tm * t[:, None, None] * v0)
                if m is not None:
                    x1_hat = x1_hat * m
                use = jax.random.bernoulli(rng_sc, 0.5, (y.shape[0], 1, 1))
                return self.module.apply(
                    variables, t, y, cond=c, mask=m,
                    x_sc=jnp.where(use, x1_hat, 0.0),
                )

        else:

            def vf(t, y, c, m):
                if vf_fn is not None:
                    return vf_fn(variables, t, y, cond=c, mask=m)
                return self.module.apply(variables, t, y, cond=c, mask=m)

        loss = self._loss_fn(vf, rng, x, mask, cond)
        return loss, new_stats

    # --------------------------------------------------------- likelihood
    @partial(jax.jit, static_argnames=("self", "ode_steps", "exact"))
    def log_prob(
        self,
        variables: dict,
        x: jnp.ndarray,
        cond: jnp.ndarray | None = None,
        mask: jnp.ndarray | None = None,
        ode_steps: int = 100,
        exact: bool = True,
        rng: jax.Array | None = None,
    ) -> jnp.ndarray:
        """log p(x) via the augmented (continuity-equation) ODE.

        Integrates (x, log-det) from t=0 (data) to t=1 (prior) with the
        divergence of the vector field accumulated along the trajectory,
        then evaluates the standard-normal prior. Parity:
        flow_matching_module.py:330-347 (exact trace; the reference computes
        the full Jacobian — here jacfwd per sample under vmap). Set
        exact=False for the Hutchinson estimator (O(1) per step instead of
        O(F) — the TPU-friendly choice for wide features).

        With n_transforms > 1 the log-det accumulates through the whole CNF
        stack: sampling runs flows in reversed order from noise, so the
        density direction chains flow 0, 1, ..., n-1 from data to prior,
        each integrated t: 0 -> 1 (the composition the reference builds by
        wrapping each flow in its own CNF, flow_matching_module.py:168-196).
        """
        if self.loss_type == "droid" and self.droid_t_max != 1.0:
            raise NotImplementedError(
                "log_prob is not defined for the droid VE prior (t_max != 1): "
                "the s=1 marginal is x + t_max*z, only approximately Gaussian"
            )
        if self.self_cond:
            raise NotImplementedError(
                "log_prob with self_cond: the sampled field is history-"
                "dependent (x1_hat carried across steps), so it is not a "
                "well-defined instantaneous ODE field for the continuity "
                "equation"
            )

        diff_sched = (
            VPDiffusionSchedule(**dict(self.diff_config))
            if self.loss_type == "diffusion"
            else None
        )

        def vf_single(k, t, xi, ci, mi):
            # single-sample vector field of flow k: (N, F) -> (N, F)
            out = self.module.apply(
                variables,
                k,
                t[None] if t.ndim == 0 else t,
                xi[None],
                cond=None if ci is None else ci[None],
                mask=None if mi is None else mi[None],
                method="flow_k",
            )[0]
            if diff_sched is not None:
                # the network predicts noise; the density ODE must use the
                # probability-flow drift (same transform as make_drift)
                _, noise_rate = diff_sched(t)
                beta = diff_sched.get_betas(t)
                out = -0.5 * beta * (xi - out / noise_rate)
            return out

        eps = None
        if not exact:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            eps = jax.random.normal(rng, x.shape, x.dtype)

        def div_single(k, t, xi, ci, mi, ei):
            if exact:
                flat = xi.reshape(-1)

                def f_flat(z):
                    return vf_single(k, t, z.reshape(xi.shape), ci, mi).reshape(-1)

                jac = jax.jacfwd(f_flat)(flat)
                return jnp.trace(jac)
            # Hutchinson: e^T (dv/dx) e
            _, jvp = jax.jvp(lambda z: vf_single(k, t, z, ci, mi), (xi,), (ei,))
            return jnp.sum(jvp * ei)

        n = ode_steps - 1
        dt = 1.0 / n

        def integrate_flow(k, xs, ladj):
            """Augmented midpoint integration of flow k from t=0 to t=1."""

            def drift(t, xs):
                ts = jnp.asarray(t)

                def one(xi, ci, mi, ei):
                    return (
                        vf_single(k, ts, xi, ci, mi),
                        div_single(k, ts, xi, ci, mi, ei),
                    )

                in_axes = (0, None if cond is None else 0, None if mask is None else 0,
                           None if eps is None else 0)
                return jax.vmap(one, in_axes=in_axes)(xs, cond, mask, eps)

            def step(state, i):
                xs, ladj = state
                t = i.astype(x.dtype) * dt
                # midpoint for both x and the log-det accumulation
                dx1, div1 = drift(t, xs)
                dx2, div2 = drift(t + 0.5 * dt, xs + 0.5 * dt * dx1)
                return (xs + dt * dx2, ladj + dt * div2), None

            (xs, ladj), _ = jax.lax.scan(step, (xs, ladj), jnp.arange(n))
            return xs, ladj

        z = x
        ladj = jnp.zeros(x.shape[0], x.dtype)
        # density direction = forward flow order (sampling runs reversed)
        for k in range(self.n_transforms):
            z, ladj = integrate_flow(k, z, ladj)
        if mask is not None:
            z = z * mask
            dims = jnp.sum(mask, axis=(1, 2)) * x.shape[-1]
        else:
            dims = jnp.asarray(float(np.prod(x.shape[1:])), x.dtype)
        sq = jnp.sum(jnp.square(z), axis=tuple(range(1, z.ndim)))
        log_prior = -0.5 * sq - 0.5 * dims * jnp.log(2 * jnp.pi)
        return log_prior + ladj

    # --------------------------------------------------------- sampling
    def _guided_net(self, variables, module, flow_idx, cond, mask, guidance_scale):
        """Raw network prediction net(t, x), with optional classifier-free
        guidance: one doubled-batch forward (cond | null-token zeros), then
        pred = p_u + w*(p_c - p_u). The SINGLE definition of the guidance
        combination — both the ODE drift (make_drift) and the em/ddim noise
        model (sample) build on it, so the null-token/guidance convention
        cannot drift between the two sampler families."""

        def raw_net(t, x, c, m):
            if flow_idx is None:
                return module.apply(variables, t, x, cond=c, mask=m)
            return module.apply(variables, flow_idx, t, x, cond=c, mask=m, method="flow_k")

        if guidance_scale is not None and guidance_scale != 1.0 and cond is not None:
            w = guidance_scale

            def net(t, x):
                xx = jnp.concatenate([x, x], axis=0)
                cc = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
                mm = None if mask is None else jnp.concatenate([mask, mask], axis=0)
                out = raw_net(t, xx, cc, mm)
                v_c, v_u = jnp.split(out, 2, axis=0)
                return v_u + w * (v_c - v_u)

            return net

        return lambda t, x: raw_net(t, x, cond, mask)

    def make_drift(
        self,
        variables,
        cond=None,
        mask=None,
        flow_idx=None,
        module=None,
        guidance_scale=None,
    ):
        """ODE drift f(t, x). For diffusion models this is the probability-flow
        ODE -0.5*beta*(x - eps_theta/sigma_t) (reference ode_wrapper:62-71).

        flow_idx selects a single flow transform (the composition runs flows
        in reverse during sampling); None applies the full stack. `module`
        overrides the applied module (e.g. the weight-norm-folded twin).

        guidance_scale w (beyond reference, requires training with
        model.cond_dropout > 0): classifier-free guidance at the network
        level, v = v_null + w*(v_cond - v_null), evaluated as ONE doubled-
        batch forward so the matmuls stay MXU-sized. Applying guidance to the
        raw network output is exact for every family here: the diffusion and
        droid drift transforms are affine in the prediction."""
        module = module or self.module
        net = self._guided_net(variables, module, flow_idx, cond, mask, guidance_scale)

        if self.loss_type == "diffusion":
            sched = VPDiffusionSchedule(**dict(self.diff_config))

            def drift(t, x):
                eps = net(t, x)
                _, noise_rates = sched(t)
                betas = sched.get_betas(t)
                return -0.5 * betas * (x - eps / noise_rates)

        elif self.loss_type == "droid" and self.droid_t_max != 1.0:
            # physical interpolation time is s*t_max (losses.droid_loss), so
            # dy/ds = t_max * E[z | y_s]; the network keeps s in [0, 1]
            tm = self.droid_t_max

            def drift(t, x):
                return tm * net(t, x)

        else:
            drift = net
        return drift

    @partial(jax.jit, static_argnames=("self", "n_samples", "ode_solver", "ode_steps", "num_points", "guidance_scale"))
    def sample(
        self,
        variables: dict,
        rng: jax.Array,
        n_samples: int | None = None,
        cond: jnp.ndarray | None = None,
        mask: jnp.ndarray | None = None,
        ode_solver: str = "midpoint",
        ode_steps: int = 100,
        num_points: int | None = None,
        guidance_scale: float | None = None,
    ) -> jnp.ndarray:
        """Generate samples by integrating the flow from t=1 (noise) to t=0.

        Matches reference `SetFlowMatchingLitModule.sample` (:637-677): draw
        z ~ N(0,1) (masked), integrate each flow transform in reverse order,
        undo in-model normalization. `num_points` overrides the configured
        set size (reference's variable-size generation hook); when a mask is
        given its particle axis wins. `guidance_scale` enables classifier-
        free guidance (see make_drift; train with model.cond_dropout > 0).
        """
        if guidance_scale is not None and self.self_cond:
            raise NotImplementedError("guidance_scale with self_cond")
        if n_samples is None:
            n_samples = cond.shape[0] if cond is not None else mask.shape[0]
        # the mask's particle axis always wins (z is multiplied by it)
        if mask is not None:
            num_points = mask.shape[1]
        elif num_points is None:
            num_points = self.num_particles
        module, variables = self.fold_weight_norm(variables)
        rng_z, rng_sde = jax.random.split(rng)
        z = jax.random.normal(rng_z, (n_samples, num_points, self.features))
        if self.loss_type == "droid":
            # s=1 marginal of the droid interpolant is x + t_max*z ~=
            # t_max*N(0,1) when t_max >> data std (exact reference behavior
            # at the default t_max=1: prior stays N(0,1))
            z = z * self.droid_t_max
        if mask is not None:
            z = z * mask
        if cond is not None and self.use_normaliser and self.conditioned:
            cond = module.apply(variables, cond, method="normalise_cond")

        if self.self_cond:
            # the x1_hat estimate persists across integration steps
            # (notebook-02 sampling semantics; odeint_fixed_sc docstring).
            # drift_sc returns the PHYSICAL drift dy/ds = tm * v so that
            # odeint_fixed_sc's endpoint estimate x - t*drift is exact for
            # the droid VE path too (y = x + s*tm*z => x = y - s*(tm*z))
            sc_tm = self.droid_t_max if self.loss_type == "droid" else 1.0

            def drift_sc(t, xx, sc):
                return sc_tm * module.apply(
                    variables, t, xx, cond=cond, mask=mask, x_sc=sc
                )

            x = odeint_fixed_sc(
                drift_sc, z, 1.0, 0.0, ode_steps=ode_steps, method=ode_solver
            )
            if self.use_normaliser:
                x = module.apply(variables, x, mask, method="reverse_norm")
            return x

        x = z
        for k in reversed(range(self.n_transforms)):
            drift = self.make_drift(
                variables, cond=cond, mask=mask, flow_idx=k, module=module,
                guidance_scale=guidance_scale,
            )

            if ode_solver in _FIXED_SOLVERS:
                x = odeint_fixed(drift, x, 1.0, 0.0, ode_steps=ode_steps, method=ode_solver)
            elif ode_solver in ("dopri5", "dopri5_zuko"):
                x = odeint_dopri5(drift, x, 1.0, 0.0, rtol=1e-4, atol=1e-4)
            elif ode_solver == "dopri5_per_sample":
                # Beyond reference: each set integrates with its OWN adaptive
                # step size (zuko/torchdyn adapt one global step for the whole
                # batch). vmap over the while_loop runs all lanes in lockstep
                # with per-lane masked updates, so easy sets stop refining
                # while hard ones keep stepping. warn_on_truncation is off:
                # under vmap lax.cond lowers to select and the debug print
                # would fire unconditionally.
                def _one(x1, c1, m1, _k=k):
                    d = self.make_drift(
                        variables,
                        cond=None if c1 is None else c1[None],
                        mask=None if m1 is None else m1[None],
                        flow_idx=_k,
                        module=module,
                        guidance_scale=guidance_scale,
                    )
                    return odeint_dopri5(
                        lambda t, xs: d(t, xs[None])[0], x1, 1.0, 0.0,
                        rtol=1e-4, atol=1e-4, warn_on_truncation=False,
                    )

                if cond is None and mask is None:
                    x = jax.vmap(lambda x1: _one(x1, None, None))(x)
                elif cond is None:
                    x = jax.vmap(lambda x1, m1: _one(x1, None, m1))(x, mask)
                elif mask is None:
                    x = jax.vmap(lambda x1, c1: _one(x1, c1, None))(x, cond)
                else:
                    x = jax.vmap(_one)(x, cond, mask)
            elif ode_solver in ("em", "ddim"):
                if self.loss_type != "diffusion":
                    raise ValueError(f"Solver {ode_solver} requires diffusion loss")
                sched = VPDiffusionSchedule(**dict(self.diff_config))
                # CFG on the noise prediction (the standard eps-space
                # formulation) — same guidance combination as the ODE path
                noise_model = self._guided_net(
                    variables, module, k, cond, mask, guidance_scale
                )

                if ode_solver == "em":
                    x = euler_maruyama_sampler(noise_model, sched, x, rng_sde, n_steps=ode_steps)
                else:
                    x = ddim_sampler(noise_model, sched, x, n_steps=ode_steps)
            else:
                raise NotImplementedError(f"Solver {ode_solver} not implemented")

        if self.use_normaliser:
            x = module.apply(variables, x, mask, method="reverse_norm")
        return x
