"""Serve an exported sampling artifact over HTTP.

    python scripts/serve_model.py --artifact <run_dir>/exported \
        [--host 0.0.0.0] [--port 8000] [--verbose]

Beyond the reference (which has no deployment layer): the server loads a
`scripts/export_model.py` artifact — a self-contained StableHLO program with
the weights and inverse normalization baked in — and answers JSON sampling
requests on whatever JAX backend the process sees (TPU in production, CPU
anywhere). No model code, config tree or checkpoint is needed at serve time.

    curl localhost:8000/healthz
    curl localhost:8000/meta
    curl -X POST localhost:8000/sample -d '{"n_samples": 4, "seed": 7,
        "cond": [[...], ...], "num_points": [30, 12, 30, 5]}'

API details: particle_fm_tpu/server.py docstring.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True,
                    help="exported artifact directory (sampler.stablehlo + meta.yaml)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--verbose", action="store_true", help="log each request")
    ap.add_argument("--max-n-samples", type=int, default=65536,
                    help="reject /sample requests above this n_samples (400)")
    ap.add_argument("--max-content-length", type=int, default=64 * 1024 * 1024,
                    help="reject request bodies larger than this (413)")
    args = ap.parse_args()

    # Pin JAX to a backend the artifact was actually lowered for BEFORE the
    # backend initializes (an exported program only runs on its export
    # platforms; and env-var JAX_PLATFORMS is unreliable when a
    # sitecustomize imports jax first — the config API always wins).
    meta_path = os.path.join(args.artifact, "meta.yaml")
    if os.path.exists(meta_path):
        import yaml

        with open(meta_path) as f:
            platforms = (yaml.safe_load(f) or {}).get("platforms")
        if platforms:
            import jax

            jax.config.update(
                "jax_platforms", ",".join(p.lower() for p in platforms)
            )

    from particle_fm_tpu.server import make_server

    server = make_server(
        args.artifact,
        host=args.host,
        port=args.port,
        warmup=not args.no_warmup,
        quiet=not args.verbose,
        max_n_samples=args.max_n_samples,
        max_content_length=args.max_content_length,
    )
    meta = server.service.meta
    host, port = server.server_address[:2]
    print(
        f"serving {args.artifact} on http://{host}:{port} "
        f"(batch_size={meta.get('batch_size')}, solver={meta.get('ode_solver')}"
        f"@{meta.get('ode_steps')} steps, units={meta.get('output_units')})",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
