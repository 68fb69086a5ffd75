"""Zero-config persistent caches (round 4).

The reference's kernel cache needs no configuration: every compiled PTX
kernel lands in an in-memory hash table keyed by the program text
(jit.cu:1239-1331) and recompilation of a seen program costs one ptxas
run (~299 ms).  enoki-tpu's equivalent machinery -- the XLA persistent
compilation cache plus the trace export cache (jax.export artifacts
keyed by the C++ structural hash) -- is strictly stronger because it
survives the process, but through round 3 it hid behind two opt-in
knobs.  This module turns both on by default under a user cache
directory with version-keyed invalidation and LRU size bounding:

    ~/.cache/enoki_tpu/xla                      XLA compiled executables
    ~/.cache/enoki_tpu/export/<version-tag>/    trace export artifacts

The version tag is ``v<enoki_tpu>-jax<jax>-<platform>`` so upgrading
either package or moving between cpu/tpu never replays a stale artifact
(jax.export additionally validates platform at call time; the tag makes
the common case never hit that path).

Opt-outs / overrides (all honored):

* ``ENOKI_TPU_EXPORT_CACHE``   = path | ``auto`` (default) | ``off``
* ``ENOKI_TPU_COMPILE_CACHE``  = path | ``auto`` (default) | ``off``
* ``JAX_COMPILATION_CACHE_DIR`` or a user call to
  ``jax.config.update('jax_compilation_cache_dir', ...)`` wins -- we
  only fill the setting when nobody else has.
* ``ENOKI_TPU_CACHE_MAX_BYTES`` bounds each cache directory (LRU by
  mtime; default 2 GiB).  The export dir is trimmed after each write;
  the XLA dir once per process at import (jax exposes no write hook).
  Export dirs under a stale version tag are removed wholesale at first
  use of the live one.
"""

from __future__ import annotations

import os

_DISABLE = ("0", "off", "none", "false", "disabled")


def cache_root() -> str:
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache")
    return os.path.join(base, "enoki_tpu")


# Revision of the trace's on-disk artifact scheme: export artifacts are
# named by the C++ structural hash, so ANY change to the hash algorithm
# (trace.cpp et_schedule) OR to an opcode's jnp lowering (the artifact
# embeds the compiled program) must bump this -- stale artifacts would
# otherwise be unreachable dead weight or, worse, replay the OLD
# semantics. h2 = splitmix64 word mixer (r4; h1 was FNV-1a); h3 = the
# clamping GATHER lowering (r4).
_TRACE_FORMAT = "h3"


def version_tag() -> str:
    """Cache-invalidation key: enoki_tpu + jax versions + platform +
    trace naming-scheme revision."""
    import jax

    from . import __version__

    try:
        plat = jax.default_backend()
    except Exception:  # backend init can fail in exotic environments;
        plat = "unknown"  # a wrong tag only costs a cold cache
    return f"v{__version__}-jax{jax.__version__}-{plat}-{_TRACE_FORMAT}"


def export_dir() -> str:
    """Resolve ``config.trace_export_dir`` to a concrete directory.

    ``auto`` (the default) -> the version-keyed user cache dir; a
    disable word -> "" (off); anything else is used verbatim (the
    pre-round-4 explicit-path behavior)."""
    from .config import config

    d = config.trace_export_dir
    if not d or d.lower() in _DISABLE:
        return ""
    if d != "auto":
        return d
    resolved = os.path.join(cache_root(), "export", version_tag())
    _prune_stale_exports(os.path.dirname(resolved), resolved)
    return resolved


_PRUNED = False


def _prune_stale_exports(parent: str, keep: str) -> None:
    """Remove STALE version-tagged export dirs (once per process):
    same-platform siblings under an old enoki_tpu/jax/format tag can
    never be loaded again and would each retain up to
    ``cache_max_bytes`` forever after an upgrade.  Dirs of OTHER
    platforms are live caches of the cpu<->tpu workflow this repo
    documents -- deleting them would force perpetual cold caches on
    every platform switch (and could yank a concurrent other-platform
    process's dir mid-write)."""
    global _PRUNED
    if _PRUNED:
        return
    _PRUNED = True
    import shutil

    # tag format: v<ver>-jax<ver>-<platform>-<fmt>; platform/fmt tokens
    # never contain dashes
    plat = os.path.basename(keep).split("-")[-2:-1]
    try:
        for name in os.listdir(parent):
            p = os.path.join(parent, name)
            if (p != keep and os.path.isdir(p)
                    and name.split("-")[-2:-1] == plat):
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def max_bytes() -> int:
    from .config import config

    return config.cache_max_bytes


def evict_lru(d: str, bound: int | None = None) -> None:
    """Bound a cache directory: delete oldest-mtime files until the
    total size fits.  Called after each artifact write; best-effort
    (concurrent processes racing on the same files are fine -- a lost
    race is just a cold entry)."""
    if bound is None:
        bound = max_bytes()
    if bound <= 0:
        return
    try:
        entries = []
        for name in os.listdir(d):
            p = os.path.join(d, name)
            try:
                st = os.stat(p)
            except OSError:
                continue
            if os.path.isfile(p):
                entries.append((st.st_mtime, st.st_size, p))
        total = sum(s for _, s, _ in entries)
        if total <= bound:
            return
        entries.sort()
        for _, s, p in entries:
            if total <= bound:
                break
            try:
                os.remove(p)
                total -= s
            except OSError:
                pass
    except OSError:
        pass


def enable_default_compile_cache() -> None:
    """Fill jax's persistent-compile-cache setting if nobody has.

    Called at package import.  jax.config.update is safe before backend
    initialization; the cache activates lazily on first compile."""
    env = os.environ.get("ENOKI_TPU_COMPILE_CACHE", "auto")
    if env.lower() in _DISABLE:
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # user configured jax directly
    import jax

    try:
        if jax.config.jax_compilation_cache_dir:
            return  # user called jax.config.update themselves
    except AttributeError:
        pass
    d = env if env and env.lower() != "auto" else os.path.join(
        cache_root(), "xla")
    try:
        os.makedirs(d, exist_ok=True)
    except OSError:
        return  # unwritable home: stay off rather than fail import
    jax.config.update("jax_compilation_cache_dir", d)
    # cache even fast compiles: the 10k-op chain's sub-programs and the
    # AD segment executables are individually quick but numerous -- but
    # only when the user hasn't set the threshold themselves (env var or
    # a pre-import jax.config.update away from jax's 1.0 default)
    if (not os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS")
            and getattr(jax.config,
                        "jax_persistent_cache_min_compile_time_secs",
                        1.0) == 1.0):
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # bound the dir once per process (jax exposes no post-write hook;
    # a session's growth is trimmed at the next import)
    evict_lru(d)
