"""Host-keyed persistent compile-cache locations.

XLA:CPU's AOT pipeline embeds the COMPILE machine's CPU feature set in
every cached executable, and loading a blob on a host that lacks any of
those features is undefined behavior — observed here first as
`cpu_aot_loader` warnings ("Machine type used for XLA:CPU compilation
doesn't match the machine type for execution... could lead to execution
errors such as SIGILL") and then as a hard SIGSEGV inside
`compilation_cache.get_executable_and_time` when a `/tmp` cache written
by a previous session on different hardware was reused, killing the
whole test run.

Keying the cache DIRECTORY by a digest of the host's CPU flags turns a
feature-set change into a clean cache miss: each distinct host
(re)compiles once into its own directory and never deserializes another
machine's code. TPU executables are unaffected either way (the device
ISA is part of XLA's own cache key); this guard is for the CPU paths —
the virtual-mesh test suite, the dryrun, and any `--platform cpu` run.
"""

from __future__ import annotations

import hashlib
import platform


def host_fingerprint() -> str:
    """8-hex-char digest of the host's CPU feature flags (order-free)."""
    flags = platform.machine()
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    flags = " ".join(
                        sorted(line.split(":", 1)[1].split())
                    )
                    break
    except OSError:
        pass
    return hashlib.sha256(flags.encode()).hexdigest()[:8]


def compile_cache_dir(base: str) -> str:
    """`base` suffixed with the host fingerprint — pass the result to
    jax.config.update("jax_compilation_cache_dir", ...)."""
    return f"{base}-{host_fingerprint()}"
