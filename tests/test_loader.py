"""Runtime native-module loader (ffi/loader.py <-> go/sppark.go).

Mirrors the poc/go test protocol (poc/go/poc_test.go): build-and-load a
hello module, call a registered symbol, check the Error contract, and
exfiltrate the artifact."""

import ctypes
import os
import shutil

import pytest

from sppark_tpu.ffi.loader import load_source, build, _CError
from sppark_tpu.util.errors import SpparkError

NATIVE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module")
def poc(tmp_path_factory):
    # build in a scratch copy so the repo tree stays clean (the Go test
    # sandbox situation that Exfiltrate exists for)
    scratch = tmp_path_factory.mktemp("poc")
    src = shutil.copy(os.path.join(NATIVE, "poc.cpp"), scratch)
    return load_source(src)


def test_wrap_symbols_resolved(poc):
    assert set(poc.symbols) >= {"sppark_poc_add", "sppark_poc_fill",
                                "sppark_poc_fail"}


def test_call_registered(poc):
    add = poc.fn("sppark_poc_add", restype=ctypes.c_int,
                 argtypes=[ctypes.c_int, ctypes.c_int])
    assert add(20, 22) == 42


def test_error_contract(poc):
    fill = poc.fn("sppark_poc_fill", restype=_CError,
                  argtypes=[ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t])
    buf = (ctypes.c_uint64 * 5)()
    poc.check(fill(buf, 5))
    assert list(buf) == [0, 1, 4, 9, 16]
    # null pointer -> populated error, message freed by check()
    with pytest.raises(SpparkError) as ei:
        poc.check(fill(None, 1), "fill")
    assert ei.value.code == 22 and "null destination" in str(ei.value)
    fail = poc.fn("sppark_poc_fail", restype=_CError)
    with pytest.raises(SpparkError) as ei:
        poc.check(fail())
    assert ei.value.code == 7


def test_stale_rebuild_and_exfiltrate(poc, tmp_path):
    # mtime-stale source triggers rebuild (go/sppark.go:195-213)
    so_before = os.path.getmtime(poc.path)
    os.utime(poc.path.replace(".so", ".cpp"))
    rebuilt = build(poc.path.replace(".so", ".cpp"))
    assert os.path.getmtime(rebuilt) >= so_before
    dest = poc.exfiltrate(str(tmp_path / "out"))
    assert os.path.exists(dest)


def test_conditional_flags(tmp_path):
    src = shutil.copy(os.path.join(NATIVE, "poc.cpp"), tmp_path)
    # ?cpu- is kept (only condition that holds), unknown conditions dropped
    mod = load_source(src, "?cpu--DSPPARK_TEST_KEPT", "?cuda--DBOGUS_FLAG",
                      force=True)
    assert "sppark_poc_add" in mod.symbols


def test_build_failure_reports_stderr(tmp_path):
    bad = tmp_path / "bad.cpp"
    bad.write_text("this does not compile")
    with pytest.raises(SpparkError) as ei:
        build(str(bad))
    assert "native build failed" in str(ei.value)
