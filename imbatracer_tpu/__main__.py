import os

# Honour a CPU request before any backend initialises: the axon TPU
# plugin ignores JAX_PLATFORMS (plural) and would claim the TPU anyway;
# the working knobs are JAX_PLATFORM_NAME + the config update (same
# preamble as tools/run_bench.py and tests/conftest.py).
if "cpu" in (os.environ.get("JAX_PLATFORMS", "")
             + os.environ.get("JAX_PLATFORM_NAME", "")):
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

from .frontend.cli import main

raise SystemExit(main())
