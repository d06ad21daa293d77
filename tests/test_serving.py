"""AOT serving export (particle_fm_tpu/serving.py + scripts/export_model.py).

Beyond-reference: the reference has no deployment path (sampling always goes
through the Lightning module + checkpoint in Python). These tests pin that
the jax.export artifact (a) reproduces the live sampler exactly, (b)
roundtrips through disk with its meta, and (c) exports/verifies end to end
from a real CLI-trained run directory.
"""

import glob
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_fm_tpu import serving
from particle_fm_tpu.models.flow_matching import FlowMatchingModel

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny_model():
    model = FlowMatchingModel(
        num_particles=8,
        features=3,
        hidden_dim=16,
        latent=4,
        layers=1,
        global_cond_dim=2,
        local_cond_dim=2,
    )
    variables = model.init(jax.random.PRNGKey(0))
    return model, variables


def _batch(n=4, npart=8, cdim=2, seed=1):
    rs = np.random.RandomState(seed)
    cond = rs.randn(n, cdim).astype(np.float32)
    mult = rs.randint(3, npart + 1, size=n)
    mask = (np.arange(npart)[None, :] < mult[:, None]).astype(np.float32)[..., None]
    return cond, mask


@pytest.mark.slow
def test_export_matches_live_sampler(tmp_path):
    model, variables = _tiny_model()
    cond, mask = _batch()
    means, stds = np.array([0.1, -0.2, 0.3]), np.array([1.5, 2.0, 0.5])

    blob, meta = serving.export_sampler(
        model, variables, batch_size=4, num_points=8, features=3, cond_dim=2,
        use_mask=True, ode_solver="midpoint", ode_steps=6, means=means, stds=stds,
    )
    out = serving.save_exported(str(tmp_path / "exported"), blob, meta)
    fn, meta2 = serving.load_exported(out)
    assert meta2["batch_size"] == 4 and meta2["output_units"] == "physical"

    live = serving.make_serve_fn(
        model, variables, batch_size=4, ode_solver="midpoint", ode_steps=6,
        num_points=8, has_cond=True, has_mask=True, means=means, stds=stds,
    )
    ref = np.asarray(live(jnp.uint32(5), jnp.asarray(cond), jnp.asarray(mask)))
    got = np.asarray(fn(np.uint32(5), cond, mask))
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)
    # masked padding rows must be exactly zero in physical space too
    assert np.all(got[mask[..., 0] == 0] == 0)
    # different seeds give different samples
    got2 = np.asarray(fn(np.uint32(6), cond, mask))
    assert np.abs(got2 - got).max() > 1e-3


def test_export_uncond_no_mask_and_serve_batches(tmp_path):
    model = FlowMatchingModel(
        num_particles=8, features=3, hidden_dim=16, latent=4, layers=1,
        global_cond_dim=0, local_cond_dim=0,
    )
    variables = model.init(jax.random.PRNGKey(0))
    blob, meta = serving.export_sampler(
        model, variables, batch_size=4, num_points=8, features=3, cond_dim=None,
        use_mask=False, ode_solver="euler", ode_steps=4,
    )
    out = serving.save_exported(str(tmp_path / "exp2"), blob, meta)
    fn, meta2 = serving.load_exported(out)
    x = serving.serve_batches(fn, meta2, n_samples=10)
    assert x.shape == (10, 8, 3) and np.isfinite(x).all()


@pytest.mark.slow
def test_export_cli_from_trained_run(tmp_path):
    """Train a tiny run through the CLI, then export + verify via the script."""
    from particle_fm_tpu.train import main

    main([
        "experiment=jetnet/fm_tops30_cond",
        "data.synthetic=true",
        "data.synthetic_num_jets=256",
        "data.batch_size=64",
        "data.num_particles=8",
        "model.num_particles=8",
        "model.hidden_dim=16",
        "model.latent=4",
        "model.layers=1",
        "trainer=smoke",
        "trainer.max_epochs=2",
        "trainer.save_last_every_n_epoch=1",
        "callbacks=none",
        f"output_dir={tmp_path}/run",
    ])
    run_dir = sorted(glob.glob(f"{tmp_path}/run/*"))[-1]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_model.py"),
         "--run_dir", run_dir, "--ckpt", "last", "--batch_size", "8",
         "--ode_steps", "4", "--verify"],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "verify: max|exported - live|" in res.stdout
    assert os.path.exists(os.path.join(run_dir, "exported", "sampler.stablehlo"))
    assert os.path.exists(os.path.join(run_dir, "exported", "meta.yaml"))


def test_export_with_baked_guidance_matches_live():
    """guidance_scale baked at export time: the artifact must equal the live
    sampler called with the same guidance_scale (and differ from w=1)."""
    model, variables = _tiny_model()
    cond, mask = _batch()

    blob, meta = serving.export_sampler(
        model, variables, batch_size=4, num_points=8, features=3, cond_dim=2,
        use_mask=True, ode_solver="midpoint", ode_steps=6, guidance_scale=2.5,
    )
    assert meta["guidance_scale"] == 2.5

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = serving.save_exported(os.path.join(d, "exported"), blob, meta)
        fn, meta2 = serving.load_exported(path)
        assert meta2["guidance_scale"] == 2.5
        got = np.asarray(fn(np.uint32(7), jnp.asarray(cond), jnp.asarray(mask)))

    rng = jax.random.PRNGKey(np.uint32(7))
    live = np.asarray(
        model.sample(variables, rng, n_samples=4, cond=jnp.asarray(cond),
                     mask=jnp.asarray(mask), ode_solver="midpoint", ode_steps=6,
                     guidance_scale=2.5)
    )
    np.testing.assert_allclose(got, live * np.asarray(mask), rtol=2e-5, atol=2e-5)

    live_w1 = np.asarray(
        model.sample(variables, rng, n_samples=4, cond=jnp.asarray(cond),
                     mask=jnp.asarray(mask), ode_solver="midpoint", ode_steps=6)
    )
    assert np.abs(live_w1 * np.asarray(mask) - got).max() > 1e-4


def test_export_guidance_requires_cond():
    model, variables = _tiny_model()
    with pytest.raises(ValueError, match="guidance_scale requires"):
        serving.export_sampler(
            model, variables, batch_size=2, num_points=8, features=3,
            cond_dim=0, use_mask=True, ode_steps=4, guidance_scale=2.0,
        )


def test_serve_batches_seed_schemes():
    """Per-chunk seed derivation is recorded in the artifact meta (ADVICE
    r4): default/hash_v1 hashes (seed, chunk) via SeedSequence, add_v0
    reproduces the legacy additive streams of pre-scheme artifacts, unknown
    names are rejected."""
    seen = []

    def fn(seed, *a):
        seen.append(int(seed))
        return np.full((4, 2), float(seed))

    meta = {"batch_size": 4, "cond_dim": 0, "use_mask": False}
    expect = [
        int(np.random.SeedSequence([3, i]).generate_state(1)[0]) for i in range(2)
    ]
    serving.serve_batches(fn, dict(meta), n_samples=8, seed=3)
    assert seen == expect  # missing key defaults to hash_v1
    seen.clear()
    serving.serve_batches(fn, dict(meta, seed_scheme="hash_v1"), n_samples=8, seed=3)
    assert seen == expect
    seen.clear()
    serving.serve_batches(fn, dict(meta, seed_scheme="add_v0"), n_samples=8, seed=3)
    assert seen == [3, 4]
    with pytest.raises(ValueError, match="seed_scheme"):
        serving.serve_batches(fn, dict(meta, seed_scheme="bogus"), n_samples=4)
