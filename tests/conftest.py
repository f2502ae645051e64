"""Test configuration: force CPU with an 8-device virtual mesh.

Mirrors SURVEY.md section 4's multi-host-without-a-pod strategy: sharding
tests run on a virtual CPU mesh; sharded-vs-single-device equality is the
invariant.

Note: this machine's sitecustomize registers a remote TPU ("axon") backend in
every interpreter and pins jax_platforms to it; tests must override via
jax.config (env vars are too late) or the first op stalls ~50 s dialing the
TPU tunnel.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: amortizes the expensive XLA CPU compiles (the
# one-program shard_map forms are tens of minutes cold; warm they are
# seconds).  Only graphs over 10s of compile are cached to keep it small.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PEBA1_CACHE", "/root/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bounded_jit_state():
    """Drop compiled executables between test modules.

    The full suite compiles hundreds of XLA CPU executables in one process;
    with all of them kept live, the CPU client's JIT has been observed to
    segfault inside backend_compile_and_load partway through the run
    (deterministically at the same compile, while the same tests pass in any
    smaller subset).  Clearing the jit caches at module boundaries bounds the
    accumulated state; module-scoped fixtures (keys etc.) are unaffected and
    per-module recompiles are covered by the persistent cache below.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(42)


@pytest.fixture(scope="session")
def toy_keys(rng):
    """Shared TOY keyset (keygen is the slowest fixture -- do it once)."""
    from peba1_tpu import keys
    from peba1_tpu.params import TOY

    return keys.keygen(rng, TOY)
