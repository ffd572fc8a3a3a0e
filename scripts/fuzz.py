"""Random-config byte-parity fuzz vs the reference miniasm binary.

Each case draws a random synthetic dataset (genome length, coverage,
read length, dropout, circularity) and a random flag combination from
the reference's surface (-R -b -1 -2 -S -r -p ...), runs both binaries,
and byte-compares stdout.  Writes one JSON artifact.

Usage: python scripts/fuzz.py [N_CASES] [--out FUZZ.json] [--seed S]
"""

import io
import json
import os
import random
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("MINIASM_TPU_PLATFORM",
                                                  "cpu"))

REF_SRC = "/root/reference"
REF_BUILD = "/tmp/miniasm_ref_build"


def ref_binary():
    exe = os.path.join(REF_BUILD, "miniasm")
    if not os.path.exists(exe):
        os.makedirs(REF_BUILD, exist_ok=True)
        for f in os.listdir(REF_SRC):
            if f.endswith((".c", ".h")) or f == "Makefile":
                shutil.copy(os.path.join(REF_SRC, f), REF_BUILD)
        subprocess.run(["make", "-j4"], cwd=REF_BUILD, check=True,
                       capture_output=True)
    return exe


def run_case(case_no, rng, exe, td):
    from miniasm_tpu import cli
    from miniasm_tpu.eval.simulate import simulate, write_paf

    gl = rng.choice([150_000, 300_000, 500_000, 800_000])
    cov = rng.choice([8.0, 12.0, 20.0, 35.0, 40.0])
    mean_read = rng.choice([3000, 6000, 8000, 12000])
    circular = rng.random() < 0.25
    drop = rng.choice([0.0, 0.0, 0.2, 0.4, 0.55])
    seed = rng.randrange(10000)
    sim = simulate(genome_len=gl, coverage=cov, mean_read=mean_read,
                   seed=seed, circular=circular)
    paf = os.path.join(td, "case%d.paf" % case_no)
    write_paf(sim, paf)
    if drop:
        drng = random.Random(seed)
        with open(paf) as f:
            kept = [ln for ln in f if drng.random() > drop]
        with open(paf, "w") as f:
            f.writelines(kept)

    args = []
    if rng.random() < 0.3:
        args += ["-R"]
    if rng.random() < 0.2:
        args += ["-b"]
    if rng.random() < 0.2:
        args += ["-1"] if rng.random() < 0.5 else ["-2"]
    if rng.random() < 0.25:
        args += ["-S", str(rng.choice([2, 3, 4, 5, 6, 7, 9, 10]))]
    if rng.random() < 0.25:
        args += ["-r", "%.1f,%.1f" % (rng.uniform(0.5, 0.9),
                                      rng.uniform(0.1, 0.5))]
    if rng.random() < 0.2:
        args += ["-n", str(rng.choice([1, 2, 4]))]
    if rng.random() < 0.2:
        args += ["-c", str(rng.choice([2, 3, 4]))]
    fmt = rng.choice(["ug", "ug", "sg", "bed", "paf"])
    args += ["-p", fmt]

    r = subprocess.run([exe] + args + [paf], capture_output=True)
    ref_out = r.stdout

    from contextlib import redirect_stdout

    buf = io.StringIO()
    try:
        with redirect_stdout(buf):
            rc = cli.main(args + [paf])
        ours = buf.getvalue().encode()
        ok = rc == 0 and ours == ref_out
        err = None
    except SystemExit as e:
        ok = ref_out == b"" and r.returncode != 0 and e.code != 0
        err = "exit %s" % e.code
    except Exception as e:  # noqa: BLE001
        ok = False
        err = repr(e)[:200]
    rec = {"case": case_no, "ok": bool(ok), "gl": gl, "cov": cov,
           "mean_read": mean_read, "circular": circular, "drop": drop,
           "seed": seed, "args": args}
    if err:
        rec["err"] = err
    return rec


def main():
    argv = sys.argv[1:]
    n_cases = 30
    out_fn = None
    seed = 4
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "--out":
            out_fn = argv[i + 1]
            i += 2
        elif argv[i] == "--seed":
            seed = int(argv[i + 1])
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    if rest:
        n_cases = int(rest[0])
    rng = random.Random(seed)
    exe = ref_binary()
    results = []
    fails = 0
    with tempfile.TemporaryDirectory() as td:
        for c in range(n_cases):
            rec = run_case(c, rng, exe, td)
            results.append(rec)
            fails += 0 if rec["ok"] else 1
            print(json.dumps(rec), flush=True)
    summary = {"cases": n_cases, "fails": fails, "results": results}
    if out_fn:
        with open(out_fn, "w") as f:
            json.dump(summary, f, indent=1)
    print(json.dumps({"cases": n_cases, "fails": fails}))
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
