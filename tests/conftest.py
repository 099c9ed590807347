"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``--xla_force_host_platform_device_count`` (SURVEY.md section 4d).  The
environment pre-registers a remote TPU backend and pins JAX_PLATFORMS to it,
so the env var alone is not enough — ``jax.config.update`` overrides the
platform before any backend is used.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# TOPFUSION_TEST_PLATFORM=default runs the suite against the machine's
# real accelerator backend, whatever its PJRT plugin is called (used
# manually for the TPU-only compiled-kernel tests, which SKIP on the
# default CPU mesh); any other value pins that platform explicitly.
_platform = os.environ.get("TOPFUSION_TEST_PLATFORM", "cpu")
if _platform != "default":
    jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", False)
