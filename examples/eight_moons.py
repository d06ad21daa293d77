"""Flow matching on the eight-moons toy problem.

The runnable counterpart of the reference's
notebooks/02_flow_matching_on_eight_moons.ipynb: transport 8 Gaussians to
two moons with CFM and an EPiC vector field over 2-D point sets, including
the self-conditioning CFM variant that only exists in that notebook.

    python examples/eight_moons.py [--steps 2000] [--self-conditioning]

Writes eight_moons.png with source / target / generated scatter plots.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_moons(n: int, noise: float = 0.05, rs=None) -> np.ndarray:
    rs = rs or np.random.RandomState(0)
    n_out = n // 2
    n_in = n - n_out
    t_out = rs.rand(n_out) * np.pi
    t_in = rs.rand(n_in) * np.pi
    outer = np.stack([np.cos(t_out), np.sin(t_out)], axis=-1)
    inner = np.stack([1 - np.cos(t_in), 0.5 - np.sin(t_in)], axis=-1)
    pts = np.concatenate([outer, inner]) + rs.randn(n, 2) * noise
    return pts.astype(np.float32)


def make_eight_gaussians(n: int, rs=None) -> np.ndarray:
    rs = rs or np.random.RandomState(1)
    angles = 2 * np.pi * rs.randint(0, 8, n) / 8
    centers = np.stack([np.cos(angles), np.sin(angles)], axis=-1) * 2.5
    return (centers + rs.randn(n, 2) * 0.15).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--set-size", type=int, default=8)
    ap.add_argument("--self-conditioning", action="store_true",
                    help="condition the vf on its own previous prediction (notebook variant)")
    ap.add_argument("--out", default="eight_moons.png")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from particle_fm_tpu.models.flow_matching import FlowMatchingModel
    from particle_fm_tpu.samplers.ode import odeint_fixed

    rs = np.random.RandomState(0)
    n_set = args.set_size
    sc = args.self_conditioning

    model = FlowMatchingModel(
        model="epic", features=2, num_particles=n_set,
        hidden_dim=64, latent=8, layers=4, frequencies=6,
        loss_type="CFM",
    )
    # with self-conditioning the net consumes cat(y, x1_hat_prev): init with
    # 4 input channels (EPiC output width stays `features`)
    dummy_x = jnp.zeros((2, n_set, 4 if sc else 2))
    variables = dict(model.module.init(jax.random.PRNGKey(0), jnp.zeros((2,)), dummy_x))
    params = variables["params"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def vf(p, t, y, x1_hat=None):
        inp = jnp.concatenate([y, x1_hat], axis=-1) if sc else y
        return model.module.apply({"params": p}, t, inp)

    # pre-generate a data pool and index it on-device for a jittable sampler
    pool = jnp.asarray(make_moons(200_000, rs=rs).reshape(-1, n_set, 2))

    def sample_jax(rng):
        idx = jax.random.randint(rng, (args.batch,), 0, pool.shape[0])
        return pool[idx]

    @jax.jit
    def train_step(p, o, rng):
        rng_d, rng_t, rng_0, rng_b = jax.random.split(rng, 4)
        x1 = sample_jax(rng_d)
        t = jax.random.uniform(rng_t, (args.batch,))
        x0 = jax.random.normal(rng_0, x1.shape)
        tb = t[:, None, None]
        y = (1 - tb) * x1 + tb * x0
        target = x0 - x1

        def loss_fn(p):
            if sc:
                # self-conditioning (notebook variant): half the time feed the
                # model its own (stop-gradient) x1 estimate x1_hat = y - t*v
                v0 = vf(p, t, y, jnp.zeros_like(y))
                x1_hat = jax.lax.stop_gradient(y - tb * v0)
                use = jax.random.bernoulli(rng_b, 0.5, (args.batch, 1, 1))
                v = vf(p, t, y, jnp.where(use, x1_hat, 0.0))
            else:
                v = vf(p, t, y)
            return jnp.mean(jnp.square(v - target))

        loss, grads = jax.value_and_grad(loss_fn)(p)
        upd, o = opt.update(grads, o)
        return optax.apply_updates(p, upd), o, loss

    rng = jax.random.PRNGKey(42)
    for step in range(args.steps):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = train_step(params, opt_state, sub)
        if step % 500 == 0:
            print(f"step {step}: loss {float(loss):.4f}")

    # sampling: hand-rolled Euler like the notebook (t: 1 -> 0). With
    # self-conditioning, the x1 estimate persists across steps.
    n_gen = 4000 // n_set
    z = jax.random.normal(jax.random.PRNGKey(7), (n_gen, n_set, 2))
    if sc:
        @jax.jit
        def gen_fn(z):
            steps = 100
            dt = -1.0 / (steps - 1)

            def body(carry, k):
                y, x1_hat = carry
                t = 1.0 + k * dt
                tv = jnp.broadcast_to(jnp.asarray(t), (y.shape[0],))
                v = vf(params, tv, y, x1_hat)
                x1_hat = y - t * v
                return (y + dt * v, x1_hat), None

            (y, _), _ = jax.lax.scan(body, (z, jnp.zeros_like(z)), jnp.arange(steps - 1))
            return y

        gen = gen_fn(z)
    else:
        drift = lambda t, y: vf(params, jnp.broadcast_to(jnp.asarray(t), (y.shape[0],)), y)
        gen = odeint_fixed(drift, z, 1.0, 0.0, ode_steps=100, method="euler")
    gen = np.asarray(gen).reshape(-1, 2)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    target = make_moons(4000, rs=np.random.RandomState(9))
    eight = make_eight_gaussians(4000)
    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    for ax, pts, title in [
        (axes[0], eight, "8 gaussians (classic source)"),
        (axes[1], target, "two moons (target)"),
        (axes[2], gen, "generated (CFM + EPiC)"),
    ]:
        ax.scatter(pts[:, 0], pts[:, 1], s=2, alpha=0.4)
        ax.set_title(title)
        ax.set_xlim(-3, 3)
        ax.set_ylim(-3, 3)
    fig.tight_layout()
    fig.savefig(args.out)
    print(f"wrote {args.out}")

    # quick quantitative check: W1 in each coordinate
    from scipy.stats import wasserstein_distance

    w1x = wasserstein_distance(gen[:, 0], target[:, 0])
    w1y = wasserstein_distance(gen[:, 1], target[:, 1])
    print(f"W1(x) = {w1x:.4f}, W1(y) = {w1y:.4f}")
    return w1x, w1y


if __name__ == "__main__":
    main()
