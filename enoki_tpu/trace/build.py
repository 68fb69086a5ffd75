"""Build the native trace runtime (g++ -> shared library, ctypes ABI).

The image has no pybind11; the native core exposes a plain C ABI and the
Python side binds it with ctypes. The library is rebuilt only when
trace.cpp changes (source-hash-named artifact, the same idea as the
reference's kernel cache keyed by source hash, src/cuda/jit.cu:1239-1249).
"""

from __future__ import annotations

import ctypes
import hashlib
import importlib.machinery
import importlib.util
import os
import subprocess
import sysconfig
import tempfile

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SRC = os.path.join(_NATIVE_DIR, "trace.cpp")
_PYMOD_SRC = os.path.join(_NATIVE_DIR, "pymod.cpp")


def _build_dir() -> str:
    d = os.environ.get("ENOKI_TPU_BUILD_DIR")
    if not d:
        d = os.path.join(tempfile.gettempdir(),
                         f"enoki_tpu_native_{os.getuid()}")
    os.makedirs(d, exist_ok=True)
    return d


def build_library() -> str:
    """Compile the native runtime if needed; return the shared-object
    path. One .so carries BOTH the plain C ABI (ctypes, cold paths) and
    the CPython fastcall module `_etnative` (the append hot path)."""
    h = hashlib.sha256()
    for src in (_SRC, _PYMOD_SRC):
        with open(src, "rb") as f:
            h.update(f.read())
    tag = h.hexdigest()[:16]
    out = os.path.join(_build_dir(), f"libenoki_trace_{tag}.so")
    if os.path.exists(out):
        return out
    # per-process temp name: two cold-cache processes building
    # concurrently must not interleave writes into one .tmp (os.replace
    # of a half-written file would publish a corrupt .so under the
    # hash name, which would then never be rebuilt)
    tmp = f"{out}.{os.getpid()}.tmp"
    inc = sysconfig.get_paths()["include"]
    cmd = ["g++", "-std=c++17", "-O2", "-fPIC", "-shared",
           f"-I{inc}", _SRC, _PYMOD_SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError as e:
        # surface the compiler diagnostics -- a bare CalledProcessError
        # makes the trace runtime's cold-start failure undiagnosable
        raise RuntimeError(
            "native trace runtime build failed:\n"
            f"  {' '.join(cmd)}\n{e.stderr.decode(errors='replace')}"
        ) from e
    os.replace(tmp, out)
    return out


def load_pymod():
    """Import the fastcall extension from the built shared object."""
    path = build_library()
    loader = importlib.machinery.ExtensionFileLoader("_etnative", path)
    spec = importlib.util.spec_from_loader("_etnative", loader, origin=path)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)
    return mod


def load_library() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_library())
    u32, u64, i32 = ctypes.c_uint32, ctypes.c_uint64, ctypes.c_int32
    P = ctypes.POINTER

    lib.et_append.restype = u32
    lib.et_append.argtypes = [i32, i32, u64, u32, u32, u32, u32]
    lib.et_append_raw.restype = u32
    lib.et_append_raw.argtypes = [i32, i32, u64, u32, u32, u32, u32]
    lib.et_literal.restype = u32
    lib.et_literal.argtypes = [i32, u64, u64]
    lib.et_data.restype = u32
    lib.et_data.argtypes = [i32, u64]
    lib.et_inc_ref_ext.argtypes = [u32]
    lib.et_dec_ref_ext.argtypes = [u32]
    lib.et_var_size.restype = u64
    lib.et_var_size.argtypes = [u32]
    lib.et_var_dtype.restype = i32
    lib.et_var_dtype.argtypes = [u32]
    lib.et_var_opcode.restype = i32
    lib.et_var_opcode.argtypes = [u32]
    lib.et_var_materialized.restype = i32
    lib.et_var_materialized.argtypes = [u32]
    lib.et_var_int_ref.restype = i32
    lib.et_var_int_ref.argtypes = [u32]
    lib.et_var_exists.restype = i32
    lib.et_var_exists.argtypes = [u32]
    lib.et_num_vars.restype = u32
    lib.et_set_label.argtypes = [u32, ctypes.c_char_p]
    lib.et_get_label.restype = i32
    lib.et_get_label.argtypes = [u32, ctypes.c_char_p, i32]
    lib.et_mark_side_effect.argtypes = [u32, u32]
    lib.et_unmark_side_effect.argtypes = [u32]
    lib.et_is_dirty.restype = i32
    lib.et_is_dirty.argtypes = [u32]
    lib.et_num_side_effects.restype = i32
    lib.et_schedule.restype = u32
    lib.et_schedule.argtypes = [P(u32), u32]
    lib.et_schedule_hash.restype = u64
    lib.et_live_vars.restype = u32
    lib.et_live_vars.argtypes = [P(u32), u32]
    lib.et_schedule_data_ids.restype = u32
    lib.et_schedule_data_ids.argtypes = [P(u32), u32]
    lib.et_schedule_literals.restype = u32
    lib.et_schedule_literals.argtypes = [P(u64), P(i32), u32]
    lib.et_schedule_output_ids.restype = u32
    lib.et_schedule_output_ids.argtypes = [P(u32), u32]
    lib.et_schedule_num_outputs.restype = u32
    lib.et_schedule_output.restype = u32
    lib.et_schedule_output.argtypes = [u32]
    lib.et_schedule_entry.argtypes = [u32, P(u32), P(i32), P(i32), P(u64),
                                      P(u32), P(u64), P(i32), P(i32)]
    lib.et_schedule_read.restype = u32
    lib.et_schedule_read.argtypes = [P(u32), P(i32), P(i32), P(u64),
                                     P(u32), P(u64),
                                     ctypes.POINTER(ctypes.c_uint8), u32]
    lib.et_set_materialized.argtypes = [u32]
    lib.et_set_data.argtypes = [u32]
    lib.et_set_log_level.argtypes = [i32]
    lib.et_log_level.restype = i32
    lib.et_stats.argtypes = [P(u64)] * 5
    lib.et_whos.restype = i32
    lib.et_whos.argtypes = [ctypes.c_char_p, i32]
    return lib
