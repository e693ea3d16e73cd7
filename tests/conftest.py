"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-device collectives (the data-parallel WGAN-GP step) are tested without
TPU hardware via XLA's host-platform device-count override — the "fake
backend" tier SURVEY.md §4 calls for.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
