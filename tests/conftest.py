import os

# Force CPU JAX with a virtual 8-device mesh for sharding tests; must be set
# before jax import.  (The session environment pins JAX_PLATFORMS=axon — the
# real TPU tunnel — so this must overwrite, not setdefault.)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize registers the axon TPU plugin at interpreter
# start (before this file runs), so the env var alone is not enough.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import shutil
import subprocess
import sys

import pytest

REF_SRC = "/root/reference"
REF_BUILD = "/tmp/miniasm_ref_build"


@pytest.fixture(scope="session")
def ref_miniasm():
    """Compile the reference miniasm out-of-tree and return the binary path.

    Used only to produce golden outputs for parity tests; reference sources
    never enter the repo."""
    exe = os.path.join(REF_BUILD, "miniasm")
    if not os.path.exists(exe):
        os.makedirs(REF_BUILD, exist_ok=True)
        for f in os.listdir(REF_SRC):
            if f.endswith((".c", ".h")) or f == "Makefile":
                shutil.copy(os.path.join(REF_SRC, f), REF_BUILD)
        r = subprocess.run(["make", "-j4"], cwd=REF_BUILD,
                           capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip("cannot build reference miniasm: %s" % r.stderr[-500:])
    return exe


def run_ref(exe, args, stdin=None):
    r = subprocess.run([exe] + args, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def run_ours(args):
    """Run our CLI in-process, capturing stdout."""
    import io
    from contextlib import redirect_stdout

    from miniasm_tpu import cli

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main(args)
    assert rc == 0
    return buf.getvalue()


@pytest.fixture(scope="session")
def sim_small(tmp_path_factory):
    """Small synthetic dataset: 200kb genome, 20x, ~500 reads."""
    from miniasm_tpu.eval.simulate import simulate, write_paf, write_fasta

    d = tmp_path_factory.mktemp("sim_small")
    sim = simulate(genome_len=200_000, coverage=20.0, seed=7)
    paf = str(d / "reads.paf")
    fa = str(d / "reads.fa")
    write_paf(sim, paf)
    write_fasta(sim, fa)
    return {"paf": paf, "fasta": fa, "sim": sim}


@pytest.fixture(scope="session")
def sim_noisy(tmp_path_factory, sim_small):
    """Degraded overlap set: random 50% dropout of sim_small's PAF lines.

    Chosen (dropout, seed) so the reference fires EVERY order-dependent
    cleaning pass on this input (verified against the compiled reference
    on the query-grouped simulator output: 84 tips, 5 bubbles, 5 internal
    cuts, 18 bi-loops, 61 short-overlap drops).  Guards the Steps 4.2-4.5
    machinery that perfect-overlapper data never exercises;
    test_noisy_counters_nonzero re-verifies the counters every run."""
    import random

    d = tmp_path_factory.mktemp("sim_noisy")
    paf = str(d / "reads_deg.paf")
    rng = random.Random(36)
    with open(sim_small["paf"]) as f, open(paf, "w") as g:
        for line in f:
            if rng.random() > 0.50:
                g.write(line)
    return {"paf": paf, "fasta": sim_small["fasta"]}
