"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-device sharding tests need jax to see 8 devices without real chips
(SURVEY.md §4 point (4)); env vars must be set before jax is first imported.

This image injects an `axon` sitecustomize (PYTHONPATH=/root/.axon_site) that
routes every XLA compilation through a remote service — a ~5x wall-time
penalty that applies even to CPU compiles. Tests don't need the TPU tunnel,
so if the axon hook is present we re-exec pytest once with a sanitized
environment (local CPU compilation only).
"""

import os
import sys

def _restore_stdio_from_parent() -> None:
    """Point fd 1/2 back at the invoking shell's stdout/stderr.

    pytest's capture plugin has already dup2'd a temp file onto fd 1/2 by the
    time conftest loads; after execve those temp files die with the old
    process and all output vanishes. The parent (shell) still holds the real
    targets, so rewire from /proc/<ppid>/fd before exec'ing.
    """
    for fd in (1, 2):
        try:
            os.dup2(
                os.open(f"/proc/{os.getppid()}/fd/{fd}", os.O_WRONLY | os.O_APPEND), fd
            )
        except OSError:
            pass


# XLA:CPU's in-process collectives rendezvous intermittently loses a
# participant on small/contended hosts (observed repeatedly on a 1-vCPU VM:
# the 8-virtual-device GSPMD tests in a full-suite run either ABORT the whole
# process at a result fetch — "Termination timeout ... Exiting to ensure a
# consistent program state" — or, with a long timeout, deadlock at 0% CPU;
# the same tests pass run alone). Two-part mitigation: a MODERATE terminate
# timeout so a lost rendezvous dies in minutes not hours, and subprocess
# isolation + retry for the collective-heavy modules (test_gspmd_isolated.py,
# same pattern test_vgg.py already uses for jaxlib's JIT-state segfault).
_COLLECTIVE_TIMEOUT_FLAGS = (
    " --xla_cpu_collective_call_terminate_timeout_seconds=120"
    " --xla_cpu_collective_timeout_seconds=120"
)

# The suite asserts numerics and structural equality, never speed — and its
# wall time is XLA:CPU COMPILE-bound (measured: the 48-layer DenseNet parity
# pair is 60+ s at the default opt level vs 3.4 s at level 0, identical
# outputs; execution at the suite's tiny shapes is a minor term). Optimization
# level 0 applies to every compile in-process and in the spawned CLI/GSPMD
# children (env inheritance). SPMD partitioning/collectives still run — they
# happen before backend optimization (test_auto's HLO collective check keeps
# passing). bench.py and the driver dryrun do NOT source this file.
_OPT_LEVEL_FLAG = " --xla_backend_optimization_level=0"

if (
    ".axon_site" in os.environ.get("PYTHONPATH", "")
    and os.environ.get("EMLIGHT_TEST_REEXEC") != "1"
):
    env = dict(os.environ)
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["EMLIGHT_TEST_REEXEC"] = "1"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
        + _COLLECTIVE_TIMEOUT_FLAGS
        + _OPT_LEVEL_FLAG
    ).strip()
    _restore_stdio_from_parent()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate" not in flags:
    flags = (flags + _COLLECTIVE_TIMEOUT_FLAGS).strip()
if "xla_backend_optimization_level" not in flags:
    flags = (flags + _OPT_LEVEL_FLAG).strip()
os.environ["XLA_FLAGS"] = flags

# Persistent compilation cache (local CPU compiles hit it; the remote-compile
# path doesn't, but tests never use it). The cache-clearing fixture below
# makes later modules recompile shared helpers — with the disk cache those
# reloads are near-instant instead of re-running LLVM. Keyed by CPU flags:
# AOT results from a different microarchitecture can SIGILL on migrating VMs.
import hashlib

try:
    with open("/proc/cpuinfo") as _f:
        _lines = _f.read().splitlines()
    # flags alone are NOT enough: LLVM tunings like +prefer-no-gather come
    # from the detected CPU (cpuid family/model/stepping), and virtualized
    # hosts can report identical "model name" strings with different cpuids —
    # key on all of them
    _sig = "|".join(
        next((l for l in _lines if l.startswith(k)), "")
        for k in ("flags", "model name", "cpu family", "model\t", "stepping")
    )
    _cpu_tag = hashlib.sha1(_sig.encode()).hexdigest()[:12]
except OSError:
    _cpu_tag = "generic"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/emlight_jax_cache_cpu_{_cpu_tag}"
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    A full-suite run accumulates hundreds of live XLA:CPU executables; jaxlib
    then segfaults inside backend_compile_and_load on a later (varying)
    compile — observed repeatedly at different suite positions, never when a
    file runs alone. Module-scoped fixtures keep arrays (safe); only the
    jit/pjit compilation caches are dropped, so later modules recompile from
    scratch instead of crashing the JIT.

    Skipped inside the short-lived GSPMD child interpreters: they run 1-2
    modules and then exit, and the whole point of batching test_dist +
    test_auto into one child is sharing the single-device reference compiles
    across the two modules.
    """
    yield
    if os.environ.get("EMLIGHT_GSPMD_CHILD") == "1":
        return
    import jax

    jax.clear_caches()
    gc.collect()


def jit0(fn):
    """jit with XLA optimization OFF (per-compile option, not process flag).

    For pure-numerics parity tests the default XLA:CPU pipeline is almost
    all of the cost (measured on the 48-layer DenseNet at bs2 32x32: 60+ s
    default vs 3.4 s at opt level 0, same outputs) — the suite's wall time
    is compile-bound, not execution-bound. Returns a callable that lowers
    and compiles per argument-shape signature with optimization level 0.
    Use ONLY where the test asserts numerics, never where it measures speed
    or inspects optimized HLO.
    """
    import jax

    cache = {}

    def call(*args):
        # pytree STRUCTURE is part of the key: two calls with different arg
        # structures but identical leaf shapes/dtypes must not collide on one
        # compiled executable (ADVICE r4)
        key = (
            str(jax.tree.structure(args)),
            tuple(
                (tuple(a.shape), str(a.dtype)) if hasattr(a, "shape") else a
                for a in jax.tree.leaves(args)
            ),
        )
        if key not in cache:
            cache[key] = (
                jax.jit(fn)
                .lower(*args)
                .compile(compiler_options={"xla_backend_optimization_level": 0})
            )
        return cache[key](*args)

    return call


def _child_cpu_seconds(pid: int) -> float | None:
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        # utime + stime are fields 14/15 of stat == indices 11/12 after ')'
        return (int(parts[11]) + int(parts[12])) / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return None


def _run_watched(cmd, env, budget: float, stall_s: float):
    """Run cmd; kill on wall-budget OR when its CPU clock stops advancing.

    The XLA:CPU rendezvous deadlock sits at 0% CPU forever, while a
    legitimately slow cold compile burns CPU the whole time — watching the
    child's CPU time separates the two without guessing a wall timeout that
    fits every host speed (ADVICE round 3: a fixed 420 s killed slow-but-
    alive cold compiles; a fixed 2400 s let deadlocks eat the suite)."""
    import subprocess
    import tempfile
    import time

    with tempfile.TemporaryFile(mode="w+") as log:
        proc = subprocess.Popen(
            cmd, env=env, stdout=log, stderr=subprocess.STDOUT, text=True
        )
        start = time.monotonic()
        last_cpu, last_adv = -1.0, time.monotonic()
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            now = time.monotonic()
            cpu = _child_cpu_seconds(proc.pid)
            if cpu is None or cpu > last_cpu + 0.5:
                last_cpu, last_adv = cpu if cpu is not None else last_cpu, now
            if now - start > budget:
                proc.kill()
                proc.wait()
                rc = f"wall timeout {budget:.0f}s"
                break
            if now - last_adv > stall_s:
                proc.kill()
                proc.wait()
                rc = f"stalled (no CPU progress for {stall_s:.0f}s)"
                break
            time.sleep(2)
        log.seek(0)
        return rc, log.read()


def run_module_isolated(path, attempts: int = 2, timeout: int = 420) -> None:
    """Run test module(s) in one fresh interpreter, retrying on crash.

    For the collective-heavy GSPMD modules: XLA:CPU's in-process rendezvous
    intermittently aborts/deadlocks the WHOLE process on small hosts (see the
    _COLLECTIVE_TIMEOUT_FLAGS note above), so they run out-of-process where a
    lost rendezvous costs one bounded retry instead of the suite. Stall
    detection (see _run_watched) kills a deadlocked child in ~2 min while a
    slow-but-alive cold compile gets the full first-attempt budget.

    `path` may be a list: modules sharing tiny configs (test_dist+test_auto
    both compile the same single-device reference steps) run in ONE child so
    those compiles happen once.
    """
    paths = [path] if isinstance(path, str) else list(path)
    env = {**os.environ, "EMLIGHT_GSPMD_CHILD": "1"}
    cmd = [sys.executable, "-m", "pytest", *paths, "-q", "-x"]
    tails = []
    for attempt in range(attempts):
        budget = max(timeout, 2400) if attempt == 0 else timeout
        rc, out = _run_watched(cmd, env, budget, stall_s=120)
        if rc == 0:
            return
        tails.append(f"rc={rc}:\n{out[-3000:]}")
    raise AssertionError(
        f"isolated module(s) {', '.join(os.path.basename(p) for p in paths)} "
        f"failed after {attempts} attempts\n" + "\n---\n".join(tails)
    )
