"""Test harness configuration.

Forces the CPU backend with 8 virtual devices BEFORE any computation so
multi-chip sharding tests run anywhere (SURVEY.md 4: multi-host tests via
mesh simulation). Note: this machine's axon TPU hook clobbers the
JAX_PLATFORMS env var at import time, so the platform must also be pinned
via jax.config.update after import. Real-TPU behavior is exercised by
bench.py and the driver's dryrun, not by the unit suite.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Small device batches so pipeline tests exercise multi-batch carry chaining.
os.environ.setdefault("BLT_DEVICE_BATCH_BYTES", str(256 * 1024))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
