"""FFI layer: the C-ABI boundary and the native host core loader.

Mirrors the reference's FFI vocabulary (rust/src/lib.rs, go/sppark.go):
  * `SpparkError` <-> RustError{code, message} (util/rusterror.h:18) — the
    C side strdup's messages, we free them via sppark_drop_error_message
    (the TAKE_RESPONSIBILITY_FOR_ERROR_MESSAGE contract, all_gpus.cpp:83).
  * `load()` <-> the Go bridge's build-on-first-use + dlopen flow
    (go/sppark.go:165-213): compiles native/msm_cpu.cpp with g++ if the
    shared object is missing or stale, then ctypes-loads it.
  * `cpu_msm()` <-> the host mult_pippenger fallback (msm/pippenger.hpp:220).
"""

from .native import load, cpu_msm, cpu_available
from .loader import load_source, build, NativeModule, check_error

__all__ = ["load", "cpu_msm", "cpu_available",
           "load_source", "build", "NativeModule", "check_error"]
