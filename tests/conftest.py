"""Test configuration.

Tests run on CPU with an 8-device virtual mesh so sharding logic is
exercised without TPU hardware (the driver separately compile-checks the
multi-chip path). Set POPPUNK_TPU_TEST_TPU=1 to run on a real chip instead.
"""

import os

if not os.environ.get("POPPUNK_TPU_TEST_TPU"):
    # env vars alone are not enough in this sandbox (a sitecustomize pins
    # jax_platforms to the TPU plugin); the config update below wins.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import numpy as np
import pytest

import jax

if not os.environ.get("POPPUNK_TPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: first-compile of even trivial programs costs
# tens of seconds on the sandboxed CPU; cache across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from synth_genomes import SyntheticPopulation


@pytest.fixture(scope="session")
def population():
    """A small synthetic bacterial population with clear strain structure."""
    return SyntheticPopulation(
        n_strains=4,
        genomes_per_strain=(5, 4, 3, 3),
        genome_length=80_000,
        core_mutation_rate=0.008,
        between_divergence=0.035,
        accessory_pool=40,
        accessory_gene_len=2_000,
        seed=20260816,
    )


@pytest.fixture(scope="session")
def population_dir(population, tmp_path_factory):
    """Population written as FASTA files + rfile, PopPUNK-style."""
    d = tmp_path_factory.mktemp("genomes")
    rfile = population.write_fastas(d)
    return d, rfile
